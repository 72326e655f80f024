"""Side-by-side Ray vs DuckDB oracle comparison — mirrors the driver's
correctness gate (row count + order-insensitive value equality)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def assert_match(ray_res, sql, sf_dir=SF):
    got = _to_pandas(ray_res)
    con = _duck(sf_dir)
    want = con.execute(sql).fetchdf()
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    assert list(got.columns) == list(want.columns), (list(got.columns), list(want.columns))
    sort_cols = list(got.columns)
    g = got.sort_values(sort_cols).reset_index(drop=True)
    w = want.sort_values(sort_cols).reset_index(drop=True)
    for c in sort_cols:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            np.testing.assert_allclose(gv.astype(float), wv.astype(float), atol=1e-9, rtol=1e-9,
                                       err_msg=f"column {c}")
        else:
            np.testing.assert_array_equal(gv.astype(str) if gv.dtype == object else gv,
                                          wv.astype(str) if wv.dtype == object else wv,
                                          err_msg=f"column {c}")


from powergraph_ray.pipelines import oracle as osql
from powergraph_ray.pipelines import queries as q

CASES = [
    ("edge_extract", q.q_edge_extract, osql.sql_edge_extract()),
    ("degree_table", q.q_degree_table, osql.sql_degree_table()),
    ("degree_top20", q.q_degree_top20, osql.sql_degree_top20()),
    ("degree_histogram", q.q_degree_histogram, osql.sql_degree_histogram()),
    ("pagerank_k5", q.q_pagerank_k5, osql.sql_pagerank_k(5)),
    ("cc_labels", q.q_cc_labels, osql.sql_cc_labels()),
    ("lpa_k4", q.q_lpa_k4, osql.sql_lpa_k(4)),
    ("sssp_hops", q.q_sssp_hops, osql.sql_sssp_hops(0)),
    ("triangle_total", q.q_triangle_total, osql.sql_triangle_total()),
    ("triangle_per_vertex", q.q_triangle_per_vertex, osql.sql_triangle_per_vertex()),
    ("bipartite_degree_top25", q.q_bipartite_degree_top25, osql.sql_bipartite_degree_top25()),
    ("cc_size_histogram", q.q_cc_size_histogram, osql.sql_cc_size_histogram()),
    ("rank_degree_join", q.q_rank_degree_join, osql.sql_rank_degree_join(5)),
    ("neighbors_top_degree", q.q_neighbors_top_degree, osql.sql_neighbors_top_degree()),
    ("graph_summary", q.q_graph_summary, osql.sql_graph_summary()),
    ("embedding_near_dups", q.q_embedding_near_dups, osql.sql_embedding_near_dups(0.45)),
    # rotated out of the driver's 50-row cap in round 4 — parity retained here
    ("embedding_rownorm", q.q_embedding_rownorm, osql.sql_embedding_rownorm()),
    ("directed_triangles", q.q_directed_triangles, osql.sql_directed_triangles()),
    ("directed_triangle_census", q.q_directed_triangle_census,
     osql.sql_directed_triangle_census()),
    ("sssp_directed_maxdeg", q.q_sssp_directed_maxdeg, osql.sql_sssp_directed_maxdeg()),
    ("kcore_k3", q.q_kcore_k3, osql.sql_kcore(3)),
    ("approx_diameter", q.q_approx_diameter, osql.sql_approx_diameter(1e-4)),
    ("coloring_variants", q.q_coloring_variants, osql.sql_coloring_variants(48)),
    ("hits_k5", q.q_hits_k5, osql.sql_hits_k(5)),
    ("ppr_k5", q.q_ppr_k5, osql.sql_ppr_k(0, 5)),
    ("clustering_coeff", q.q_clustering_coeff, osql.sql_clustering_coeff()),
    ("link_prediction_top20", q.q_link_prediction_top20,
     osql.sql_link_prediction_topk(20)),
    ("copurchase_top20", q.q_copurchase_top20, osql.sql_copurchase_topk(20)),
    ("harmonic_100", q.q_harmonic_100, osql.sql_harmonic(100)),
    ("sir_cascade", q.q_sir_cascade, osql.sql_sir_cascade()),
    ("sis_cascade", q.q_sis_cascade, osql.sql_sir_cascade(model="SIS")),
    ("katz_k5", q.q_katz_k5, osql.sql_katz_k(5)),
    ("ppr_nibble", q.q_ppr_nibble, osql.sql_ppr_nibble()),
    ("effective_diameter", q.q_effective_diameter,
     osql.sql_effective_diameter()),
    ("degree_assortativity", q.q_degree_assortativity,
     osql.sql_degree_assortativity()),
    ("edge_reciprocity", q.q_edge_reciprocity, osql.sql_edge_reciprocity()),
    ("eigencentrality_k5", q.q_eigencentrality_k5,
     osql.sql_eigencentrality_k(5)),
    ("scc", q.q_scc, osql.sql_scc()),
    ("scc_condensation", q.q_scc_condensation, osql.sql_scc_condensation()),
    ("dag_depth", q.q_dag_depth, osql.sql_dag_depth()),
    ("mis", q.q_mis, osql.sql_mis(48)),
    ("weighted_pagerank_k5", q.q_weighted_pagerank_k5,
     osql.sql_weighted_pagerank_k(5)),
    ("neighborhood_embedding", q.q_neighborhood_embedding,
     osql.sql_neighborhood_embedding()),
    ("edge_jaccard", q.q_edge_jaccard, osql.sql_edge_jaccard()),
    ("local_sparsify", q.q_local_sparsify, osql.sql_local_sparsify(0.5)),
    ("landmark_distance", q.q_landmark_distance,
     osql.sql_landmark_distance(0, 16)),
    ("distance_summary", q.q_distance_summary,
     osql.sql_distance_summary(100)),
    ("maximal_matching", q.q_maximal_matching, osql.sql_maximal_matching(7)),
    ("vertex_cover", q.q_vertex_cover, osql.sql_vertex_cover(7)),
    ("lpa_modularity", q.q_lpa_modularity, osql.sql_lpa_modularity(4)),
    ("densest_subgraph", q.q_densest_subgraph, osql.sql_densest_subgraph()),
]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_query_matches_oracle(name, fn, sql):
    assert_match(fn(SF), sql)


CASES2 = [
    ("doc_exact_dedup", q.q_doc_exact_dedup, osql.sql_doc_exact_dedup()),
    ("ngram_jaccard_dups", q.q_ngram_jaccard_dups, osql.sql_ngram_jaccard_dups(0.5)),
    ("dedup_groups", q.q_dedup_groups, osql.sql_dedup_groups(0.5)),
    ("doc_token_stats", q.q_doc_token_stats, osql.sql_doc_token_stats()),
    ("doc_quality", q.q_doc_quality, osql.sql_doc_quality()),
    ("doc_langid", q.q_doc_langid, osql.sql_doc_langid()),
    ("minhash_near_dups", q.q_minhash_near_dups, osql.sql_minhash_near_dups(0.5)),
    ("doc_fingerprints", q.q_doc_fingerprints, osql.sql_doc_fingerprints()),
    ("events_hourly", q.q_events_hourly, osql.sql_events_hourly()),
    ("user_activity", q.q_user_activity, osql.sql_user_activity()),
    ("ann_top5", q.q_ann_top5, osql.sql_ann_top5()),
    ("knn_graph", q.q_knn_graph, osql.sql_knn_graph(5)),
    ("doc_profile", q.q_doc_profile, osql.sql_doc_profile()),
    ("doc_repetition", q.q_doc_repetition, osql.sql_doc_repetition()),
    ("doc_pii", q.q_doc_pii, osql.sql_doc_pii()),
    ("token_df", q.q_token_df, osql.sql_token_df(2)),
    ("decontaminate", q.q_decontaminate, osql.sql_decontaminate(17, 0.5)),
    ("kmeans_embeddings", q.q_kmeans_embeddings, osql.sql_kmeans_embeddings(8, 10)),
    ("semantic_dedup", q.q_semantic_dedup, osql.sql_semantic_dedup(8, 5, 0.45)),
    ("boilerplate_stats", q.q_boilerplate_stats, osql.sql_boilerplate_stats(5)),
    ("unigram_logprob", q.q_unigram_logprob, osql.sql_unigram_logprob(1.0)),
    ("bigram_logprob", q.q_bigram_logprob, osql.sql_bigram_logprob(1.0)),
    ("dsir_logratio", q.q_dsir_logratio, osql.sql_dsir_logratio("en", 1.0)),
    ("curate_corpus", q.q_curate_corpus, osql.sql_curate_corpus()),
    ("pack_manifest", q.q_pack_manifest, osql.sql_pack_manifest()),
    ("token_budget_sample", q.q_token_budget_sample,
     osql.sql_token_budget_sample()),
]


@pytest.mark.parametrize("name,fn,sql", CASES2, ids=[c[0] for c in CASES2])
def test_doc_query_matches_oracle(name, fn, sql):
    assert_match(fn(SF), sql)


def test_closeness_matches_oracle():
    assert_match(q.q_closeness_100(SF), osql.sql_closeness(100))


CASES3 = [
    ("doc_sample_10pct", q.q_doc_sample_10pct, osql.sql_doc_sample_10pct()),
    ("events_stratified_first5", q.q_events_stratified_first5,
     osql.sql_events_stratified_first5()),
    ("doc_top20_quality", q.q_doc_top20_quality, osql.sql_doc_top20_quality()),
]


@pytest.mark.parametrize("name,fn,sql", CASES3, ids=[c[0] for c in CASES3])
def test_sampling_query_matches_oracle(name, fn, sql):
    assert_match(fn(SF), sql)
