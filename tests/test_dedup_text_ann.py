"""Python-oracle tests for the non-SQL-expressible pipeline operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from powergraph_ray.stages.ann import brute_force_topk, lsh_topk
from powergraph_ray.stages.dedup import (
    MinHasher,
    _shingle_hashes,
    _word_hashes,
    minhash_near_dups,
    ngram_jaccard,
    simhash_codes,
)
from powergraph_ray.stages.text import Fingerprint

SF = "/root/testdata/sf0.001"


def _docs(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    mh = MinHasher(n_perm=256)
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    true = ngram_jaccard(a, b)
    assert abs(est - true) < 0.15


def test_minhash_near_dups_finds_planted_pair():
    base = " ".join(f"w{i}" for i in range(120))
    near = " ".join(f"w{i}" for i in range(119)) + " zz"
    far = " ".join(f"x{i}" for i in range(120))
    ds = _docs([base, near, far, base])
    out = minhash_near_dups(ds, threshold=0.8).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs      # near-dup
    assert (0, 3) in pairs      # exact dup
    assert (0, 2) not in pairs  # unrelated
    # verified jaccard values are exact
    row = out[(out["doc_a"] == 0) & (out["doc_b"] == 1)].iloc[0]
    assert abs(row["jaccard"] - ngram_jaccard(base, near)) < 1e-6  # 6dp rounding in pipeline


def test_simhash_deterministic_and_close_for_similar():
    a = " ".join(f"w{i}" for i in range(100))
    b = " ".join(f"w{i}" for i in range(99)) + " zz"
    ds = _docs([a, b, a])
    out = simhash_codes(ds).to_pandas().sort_values("doc_id")
    h = out["simhash"].to_numpy().astype(np.uint64)
    assert h[0] == h[2]
    hamming = bin(int(h[0]) ^ int(h[1])).count("1")
    assert hamming < 16  # similar docs → close codes


def test_fingerprint_whitespace_robust():
    fp = Fingerprint()
    b = pd.DataFrame({"doc_id": [0, 1], "text": ["hello   world  foo", "hello world foo"]})
    out = fp(b)
    assert out["fingerprint"][0] == out["fingerprint"][1]


def test_brute_force_topk_matches_numpy():
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    got = brute_force_topk(emb, query_ids=[0, 1], k=3)
    df = emb.to_pandas().sort_values("vec_id")
    m = np.asarray([np.asarray(e, np.float64) for e in df["embedding"]])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in (0, 1):
        sims = mn @ mn[qid]
        sims[qid] = -np.inf
        order = np.lexsort((df["vec_id"].to_numpy(), -sims))[:3]
        want = df["vec_id"].to_numpy()[order]
        have = got[got["query_id"] == qid]["neighbor_id"].to_numpy()
        np.testing.assert_array_equal(have, want)


def test_lsh_topk_subset_of_brute_force_space():
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    got = lsh_topk(emb, query_ids=list(range(5)), k=5, bits=6)
    assert (got["query_id"] != got["neighbor_id"]).all()
    assert got.groupby("query_id").size().max() <= 5
    # approximate sims must be true cosine values (spot check one row)
    df = emb.to_pandas().set_index("vec_id")
    r = got.iloc[0]
    a = np.asarray(df.loc[r["query_id"], "embedding"], np.float64)
    b = np.asarray(df.loc[r["neighbor_id"], "embedding"], np.float64)
    true = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(true - r["sim"]) < 1e-5


def test_ivf_topk_recall_and_full_probe_exact():
    """IVF ANN: probing ALL cells must equal brute force exactly; probing a
    quarter of the cells must keep high top-5 recall on clustered data."""
    import ray.data

    from powergraph_ray.stages.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(13)
    # clustered vectors so IVF cells are meaningful
    centers = rng.normal(size=(8, 16)) * 5
    x = np.concatenate([c + rng.normal(size=(50, 16)) for c in centers])
    ids = np.arange(len(x), dtype=np.int64)
    import pyarrow as pa

    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(x), pa.list_(pa.float64())),
    })).repartition(4)
    qids = list(range(0, 400, 40))
    exact = brute_force_topk(ds, qids, k=5)
    full = ivf_topk(ds, qids, k=5, n_cells=8, n_probe=8)
    pd.testing.assert_frame_equal(exact.reset_index(drop=True),
                                  full.reset_index(drop=True))
    approx = ivf_topk(ds, qids, k=5, n_cells=8, n_probe=2)
    hits = 0
    for q in qids:
        want = set(exact[exact["query_id"] == q]["neighbor_id"])
        got = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(want & got)
    recall = hits / (len(qids) * 5)
    assert recall > 0.9, recall


def test_lsh_indexed_matches_inline_and_prunes_reads(tmp_path):
    """Materialized bucket-partitioned LSH index: identical results to the
    inline lsh_topk (same planes), and the pruned read loads strictly fewer
    rows than the table (partition pruning — the 10^12-row lever)."""
    from powergraph_ray.stages.ann import (LshBuckets, _pruned_read, lsh_index,
                                           lsh_topk_indexed)

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    idx = lsh_index(emb, str(tmp_path / "lsh_idx"), bits=6, seed=11)
    qids = list(range(5))
    got = lsh_topk_indexed(idx, qids, k=5, bits=6, seed=11)
    want = lsh_topk(emb, qids, k=5, bits=6)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
    # the pruned read touches only the query buckets' partitions
    df = emb.to_pandas().sort_values("vec_id")
    m = np.asarray([np.asarray(e, np.float64) for e in df["embedding"]])
    qcodes = LshBuckets(m.shape[1], 6, 11).code(m[np.isin(df["vec_id"], qids)])
    pruned = _pruned_read(idx, "bucket_dir", np.unique(qcodes))
    assert pruned.count() < emb.count()


def test_ivf_indexed_matches_inline(tmp_path):
    from powergraph_ray.stages.ann import ivf_index, ivf_topk, ivf_topk_indexed

    rng = np.random.default_rng(13)
    centers = rng.normal(size=(8, 16)) * 5
    x = np.concatenate([c + rng.normal(size=(50, 16)) for c in centers])
    ids = np.arange(len(x), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(x), pa.list_(pa.float64())),
    })).repartition(4)
    qids = list(range(0, 400, 40))
    idx = ivf_index(ds, str(tmp_path / "ivf_idx"), n_cells=8, kmeans_iters=5)
    got = ivf_topk_indexed(idx, qids, k=5, n_probe=2)
    want = ivf_topk(ds, qids, k=5, n_cells=8, n_probe=2)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_ngram_jaccard_dups_exact_all_pairs():
    from powergraph_ray.stages.dedup import ngram_jaccard_dups

    base = " ".join(f"w{i}" for i in range(120))
    near = " ".join(f"w{i}" for i in range(119)) + " zz"
    far = " ".join(f"x{i}" for i in range(120))
    short = "one two"            # <k tokens → unigram-set fallback
    short2 = "one two"           # identical short doc → jaccard 1.0
    ds = _docs([base, near, far, base, short, short2])
    out = ngram_jaccard_dups(ds, threshold=0.5).to_pandas()
    got = {(a, b): j for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"])}
    # brute-force python oracle over every pair
    texts = [base, near, far, base, short, short2]
    expect = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            j = ngram_jaccard(texts[a], texts[b])
            if j >= 0.5:
                expect[(a, b)] = j
    assert set(got) == set(expect)
    for p, j in expect.items():
        assert abs(got[p] - j) < 1e-6
    # pairs sharing zero shingles never appear (posting-list semantics)
    assert (0, 2) not in got


def test_ngram_jaccard_max_df_drops_hot_shingles():
    from powergraph_ray.stages.dedup import ngram_jaccard_dups

    # 5 identical docs: every shingle has df=5 > max_df=3 → no pairs scored
    ds = _docs(["a b c d e f"] * 5)
    out = ngram_jaccard_dups(ds, threshold=0.5, max_df=3).to_pandas()
    assert len(out) == 0
    out_full = ngram_jaccard_dups(ds, threshold=0.5, max_df=None).to_pandas()
    assert len(out_full) == 10  # C(5,2) exact-dup pairs at jaccard 1.0
    assert (out_full["jaccard"] == 1.0).all()


def test_ngram_jaccard_max_df_matches_sql_oracle_under_cut():
    """Engine and DuckDB oracle apply the IDENTICAL max_df cut: hot shingles
    leave intersection counting but still count toward per-doc totals."""
    import duckdb
    import pyarrow as pa

    from powergraph_ray.pipelines.oracle import sql_ngram_jaccard_dups
    from powergraph_ray.stages.dedup import ngram_jaccard_dups

    # 'common common common' shingle appears in ALL 4 docs (df=4 > max_df=3);
    # the rare tails only pair up docs 0/1 and 2/3
    texts = ["common common common aa bb cc",
             "common common common aa bb dd",
             "common common common xx yy zz",
             "common common common xx yy ww"]
    ds = _docs(texts)
    got = (ngram_jaccard_dups(ds, threshold=0.2, max_df=3).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))
    want = (con.execute(sql_ngram_jaccard_dups(0.2, max_df=3)).fetchdf()
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert len(got) == len(want) and len(got) > 0
    assert list(got["doc_a"]) == list(want["doc_a"])
    assert list(got["doc_b"]) == list(want["doc_b"])
    np.testing.assert_allclose(got["jaccard"], want["jaccard"], atol=1e-9)
    # the cut changed the scores vs the uncut closure (it actually bit):
    # the df=4 'common common common' shingle is excluded from the
    # intersection (0.333…) but not from the union, vs 0.6 uncut
    uncut = (ngram_jaccard_dups(ds, threshold=0.2, max_df=None).to_pandas()
             .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert float(got["jaccard"][0]) < float(uncut["jaccard"][0])


def test_simhash_near_dups_matches_allpairs_hamming():
    from powergraph_ray.stages.dedup import (SimHasher, _popcount64,
                                             simhash_near_dups)

    base = " ".join(f"w{i}" for i in range(120))
    near = " ".join(f"w{i}" for i in range(119)) + " zz"
    far = " ".join(f"x{i}" for i in range(120))
    texts = [base, near, far, base, "solo doc here"]
    ds = _docs(texts)
    out = simhash_near_dups(ds, max_hamming=3).to_pandas()
    got = {(a, b): h for a, b, h in
           zip(out["doc_a"], out["doc_b"], out["hamming"])}
    # python oracle: all-pairs hamming over the same codes
    codes = SimHasher()(pd.DataFrame({"doc_id": range(len(texts)),
                                      "text": texts}))["simhash"].to_numpy(np.uint64)
    expect = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            h = int(_popcount64(np.array([codes[a] ^ codes[b]]))[0])
            if h <= 3:
                expect[(a, b)] = h
    assert got == expect
    assert got[(0, 3)] == 0  # exact dup
    assert (0, 2) not in got


def test_simhash_near_dups_recall_guard():
    import pytest

    from powergraph_ray.stages.dedup import simhash_near_dups

    with pytest.raises(ValueError):
        simhash_near_dups(_docs(["a"]), max_hamming=4, n_chunks=4)


def test_fuzzy_dedup_keep_matches_unionfind_oracle():
    from powergraph_ray.stages.dedup import fuzzy_dedup_keep

    base = " ".join(f"w{i}" for i in range(120))
    texts = [
        base,
        " ".join(f"w{i}" for i in range(119)) + " zz",   # near-dup of 0
        " ".join(f"x{i}" for i in range(120)),           # unrelated
        base,                                            # exact dup of 0
        " ".join(f"y{i}" for i in range(80)),
        " ".join(f"y{i}" for i in range(79)) + " q",     # near-dup of 4
    ]
    ds = _docs(texts)
    # union-find oracle over the SAME verified pair set the pipeline emits
    pairs = minhash_near_dups(ds, threshold=0.8).to_pandas()
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for i in range(len(texts)):
        comps.setdefault(find(i), []).append(i)

    out = (fuzzy_dedup_keep(ds, threshold=0.8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(texts)                 # every doc gets a row
    for members in comps.values():
        lo = min(members)
        for m in members:
            row = out.iloc[m]
            assert row["canonical_id"] == (lo if len(members) > 1 else m)
            assert row["group_size"] == (len(members) if len(members) > 1 else 1)
            assert row["keep"] == int(row["canonical_id"] == m)
    assert out["keep"].sum() == len(comps)        # one survivor per group


def test_token_budget_sample_invariant_to_bucket_count():
    """The distributed selection (coarse-bucket histogram + boundary-only
    exact sort) must be a pure optimization: 4 priority buckets (huge
    boundary groups) and 4096 (tiny ones) give identical keep sets."""
    import os

    import ray.data

    from powergraph_ray.stages.sampling import token_budget_sample

    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text", "source"])
    a = token_budget_sample(ds, budget_tokens=700, salt=3, n_pbuckets=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = token_budget_sample(ds, budget_tokens=700, salt=3, n_pbuckets=4096) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert 0 < a["keep"].sum() < len(a)   # budget actually bites
