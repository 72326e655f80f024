"""Text/curation-operator stress run: a deterministic synthetic corpus at
~100x the sf0.1 bench volume (default 500k docs, ~150 MB of text) through
the headline LLM-data operators, reporting per-op wall and docs/s.

The corpus is batching-invariant (every token is a pure function of
(seed, doc_id, position) via splitmix64 inverse-CDF over a Zipf vocabulary
— the same construction as sources/synthetic.py's powerlaw generator), with
planted exact duplicates (every 41st doc copies its predecessor) and
near-duplicates (every 37th doc copies its predecessor with the first token
changed), so dedup operators have real work. Generated once in parallel via
Ray and cached as hash-named Parquet under /tmp.

Usage:  [RAY_GRAFT_CPUS=32] python tools/stress_textops.py [--docs 500000]
Prints one JSON line: {"docs": N, "mb_text": M, "ops": {name: {"sec": s,
"rows": r, "docs_per_sec": d}}, "num_cpus": C}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from powergraph_ray.ids import integer_mix  # noqa: E402

V = 30_000          # vocabulary size
ZIPF_A = 1.2        # weight 1/k^a
MIN_TOK, SPAN = 20, 80


def _zipf_cdf() -> np.ndarray:
    w = 1.0 / np.arange(1, V + 1) ** ZIPF_A
    return np.cumsum(w) / w.sum()


_WORDS = np.array([f"w{i:05d}" for i in range(V)])


def _u01(x: np.ndarray) -> np.ndarray:
    return integer_mix(x).astype(np.float64) / 2.0**64


def _doc_tokens(doc_id: int, cdf: np.ndarray) -> np.ndarray:
    n = MIN_TOK + int(integer_mix(np.uint64(doc_id) ^ np.uint64(0xA5)) % np.uint64(SPAN))
    u = _u01(np.uint64(doc_id) * np.uint64(128) + np.arange(n, dtype=np.uint64)
             ^ np.uint64(0xC3))
    return np.searchsorted(cdf, u)


def gen_batch(batch: pd.DataFrame, cdf: np.ndarray) -> pd.DataFrame:
    texts, langs = [], []
    for did in batch["id"].to_numpy():
        did = int(did)
        base = did - 1 if (did % 41 == 1 or did % 37 == 1) and did > 0 else did
        idx = _doc_tokens(base, cdf)
        if did % 37 == 1 and did % 41 != 1 and did > 0:
            idx = idx.copy()
            idx[0] = (idx[0] + 1) % V          # near-dup: one token changed
        texts.append(" ".join(_WORDS[idx]))
        h = int(integer_mix(np.uint64(did) ^ np.uint64(0x77)) % np.uint64(10))
        langs.append("en" if h < 7 else ("de", "fr", "es")[h % 3])
    return pd.DataFrame({"doc_id": batch["id"].to_numpy(),
                         "text": texts, "lang": langs})


def build_corpus(n_docs: int) -> str:
    import ray.data

    out = f"/tmp/pg_stress_docs_{n_docs}_{V}_{ZIPF_A}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    cdf = _zipf_cdf()
    (ray.data.range(n_docs)
     .map_batches(lambda b: gen_batch(b, cdf), batch_format="pandas",
                  batch_size=8192)
     .write_parquet(out))
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def gen_new_batch(batch: pd.DataFrame, cdf: np.ndarray,
                  n_corpus: int) -> pd.DataFrame:
    """Day-1 ingestion batch with ids disjoint from the corpus: every 5th
    doc is an EXACT dup of a corpus doc, every 21st a dup of its in-batch
    predecessor, the rest fresh (token streams seeded past the corpus id
    range)."""
    texts = []
    ids = batch["id"].to_numpy() + n_corpus
    for did in ids:
        did = int(did)
        if did % 5 == 0:
            idx = _doc_tokens((did * 17) % n_corpus, cdf)
        elif did % 21 == 1:
            idx = _doc_tokens(did - 1, cdf)
        else:
            idx = _doc_tokens(did, cdf)
        texts.append(" ".join(_WORDS[idx]))
    return pd.DataFrame({"doc_id": ids.astype(np.int64), "text": texts,
                         "lang": ["en"] * len(ids)})


def build_prepared(n_docs: int, n_new: int) -> tuple[str, str, str]:
    """Cache: day-0 prepared corpus (export + MinHash index via
    prepare_corpus) and a day-1 batch parquet → (day0_dir, index_dir,
    new_batch_parquet)."""
    import ray.data

    from powergraph_ray.pipelines.prepare import prepare_corpus

    root = f"/tmp/pg_stress_prep_{n_docs}_{n_new}_{V}_{ZIPF_A}"
    day0, idx = os.path.join(root, "day0"), os.path.join(root, "mh_idx")
    newp = os.path.join(root, "new_batch")
    if os.path.exists(os.path.join(root, "_DONE")):
        return day0, idx, newp
    corpus = build_corpus(n_docs)
    cdf = _zipf_cdf()
    prepare_corpus(
        ray.data.read_parquet(corpus, columns=["doc_id", "text"]),
        day0, n_shards=256, jaccard_threshold=0.5, index_path=idx)
    (ray.data.range(n_new)
     .map_batches(lambda b: gen_new_batch(b, cdf, n_docs),
                  batch_format="pandas", batch_size=8192)
     .write_parquet(newp))
    open(os.path.join(root, "_DONE"), "w").close()
    return day0, idx, newp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--new-docs", type=int, default=None,
                    help="incremental-batch size (default docs//10)")
    ap.add_argument("--ops", default=None,
                    help="comma-separated subset of op names to run")
    args = ap.parse_args()
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    corpus = build_corpus(args.docs)
    gen_sec = round(time.perf_counter() - t0, 2)

    import ray.data

    from powergraph_ray.stages.curation import (bigram_logprob, curate_corpus,
                                                decontaminate, dsir_logratio,
                                                duplicate_spans, line_dedup,
                                                token_df, unigram_logprob)
    from powergraph_ray.stages.dedup import (exact_dedup, fuzzy_dedup_keep,
                                             minhash_near_dups,
                                             ngram_jaccard_dups,
                                             simhash_near_dups)
    from powergraph_ray.stages.export import export_shards
    from powergraph_ray.stages.pack import pack_manifest
    from powergraph_ray.stages.sampling import token_budget_sample
    from powergraph_ray.stages.text import doc_profile

    def docs(cols=("doc_id", "text")):
        return ray.data.read_parquet(corpus, columns=list(cols))

    mb = round(sum(os.path.getsize(os.path.join(corpus, f))
                   for f in os.listdir(corpus)) / 1e6, 1)

    ops = {
        "exact_dedup": lambda: exact_dedup(docs()),
        "doc_profile": lambda: doc_profile(docs()),
        "curate_corpus": lambda: curate_corpus(docs()),
        "token_df": lambda: token_df(docs(), min_df=2),
        "unigram_logprob": lambda: unigram_logprob(docs()),
        "bigram_logprob": lambda: bigram_logprob(docs()),
        "dsir_logratio": lambda: dsir_logratio(
            docs(("doc_id", "text", "lang"))),
        "minhash_near_dups": lambda: minhash_near_dups(docs(), threshold=0.5),
        # the packaged corpus-wide keep-list: minhash pairs + distributed CC
        # + broadcast flag pass — its delta over minhash_near_dups is the
        # cost of the group/flag downstream at this dup density (~5%)
        "fuzzy_dedup_keep": lambda: fuzzy_dedup_keep(docs(), threshold=0.5),
        # ngram_jaccard_dups and simhash_near_dups are deliberately NOT
        # here. The exact posting closure is the small-scale oracle
        # baseline — on this 500k Zipf corpus even max_df=1000 admits
        # ~sum(df^2)/2 pair expansions in the heavy mid-frequency band
        # (measured: runaway task queue, host load 700+). SimHash
        # chunk-banding hits its documented hot-bucket caveat here too:
        # every synthetic doc draws from the SAME Zipf distribution, so
        # codes concentrate and popular 16-bit chunk values host 10^4+ docs
        # (m^2/2 pair runs) — a homogeneity artifact of the synthetic
        # corpus, not of real diverse text. The scale route for near-dup
        # IS minhash_near_dups above, exactly as both docstrings route it.
        "decontaminate": lambda: decontaminate(docs(), bench_mod=17),
        "pack_manifest": lambda: pack_manifest(docs(), seq_len=2048,
                                               n_shards=256),
        "token_budget_sample": lambda: token_budget_sample(
            docs(("doc_id", "text", "lang")), budget_tokens=2_000_000,
            by="lang"),
        "export_shards": lambda: export_shards(
            docs(), f"/tmp/pg_stress_export_{time.time_ns()}", n_shards=256),
        "line_dedup": lambda: line_dedup(docs(), min_df=2),
        "duplicate_spans": lambda: duplicate_spans(docs(), k=10, min_df=2),
    }

    def prepare_corpus_op():
        # end-to-end curate → minhash-dedup → shard-export capstone, timed
        # from scratch (build_prepared's cached artifact is for the
        # incremental ops; this measures the full day-0 pass itself). The
        # returned manifest is lazy — the harness's materialize() drives
        # the whole export (rows = shard count).
        from powergraph_ray.pipelines.prepare import prepare_corpus

        out = f"/tmp/pg_stress_prepare_{time.time_ns()}"
        return prepare_corpus(docs(), out, n_shards=64,
                              jaccard_threshold=0.5)

    ops["prepare_corpus"] = prepare_corpus_op

    def bpe_op():
        from powergraph_ray.stages.bpe import bpe_encode, bpe_train

        model = bpe_train(docs(), n_merges=512, max_words=65536)
        return bpe_encode(docs(), model)

    ops["bpe_train_encode"] = bpe_op

    def clf_op():
        from powergraph_ray.stages.classifier import (
            logreg_score, quality_features, train_quality_classifier)

        def weak(df):
            return ((df["n_tokens"] >= 40) & (df["stop_ratio"] > 0)).astype(int)

        w, cols = train_quality_classifier(docs(), weak, iters=6)
        return logreg_score(quality_features(docs()), w, cols)

    ops["quality_classifier"] = clf_op

    # incremental ingestion: day-1 batch (default docs//10; ~20% corpus
    # dups + ~5% in-batch dups) against the CACHED day-0 prepared corpus.
    # update_index=False so the cached index stays pristine across runs —
    # the index-append cost is the (already measured) minhash_index pass
    # over the survivors.
    n_new = args.new_docs or args.docs // 10

    def prepare_incremental():
        from powergraph_ray.pipelines.prepare import prepare_corpus_incremental

        day0, idx, newp = build_prepared(args.docs, n_new)
        return prepare_corpus_incremental(
            ray.data.read_parquet(newp, columns=["doc_id", "text"]),
            f"/tmp/pg_stress_day1_{time.time_ns()}", idx, day0,
            n_shards=64, jaccard_threshold=0.5, corpus_n_shards=256,
            update_index=False)

    ops["prepare_incremental"] = prepare_incremental

    # incremental EXACT dedup: content_index over the corpus is cached
    # beside it; the timed op is the new-batch match only
    def exact_incremental():
        from powergraph_ray.stages.dedup import exact_match_index

        day0, idx, newp = build_prepared(args.docs, n_new)
        exidx = os.path.join(os.path.dirname(idx), "ex_idx")
        if not os.path.exists(exidx):
            from powergraph_ray.stages.dedup import content_index

            content_index(docs(), exidx + ".building")
            os.rename(exidx + ".building", exidx)  # atomic vs mid-build kill
        return exact_match_index(
            ray.data.read_parquet(newp, columns=["doc_id", "text"]), exidx)

    ops["exact_match_index"] = exact_incremental
    if args.ops:
        keep = set(args.ops.split(","))
        ops = {n: f for n, f in ops.items() if n in keep}
    if "prepare_incremental" in ops or "exact_match_index" in ops:
        build_prepared(args.docs, n_new)  # bootstrap outside the timed window
    if "exact_match_index" in ops:
        exact_incremental()  # index build outside the timed window
    res = {}
    for name, fn in ops.items():
        t0 = time.perf_counter()
        n = fn().materialize().count()
        sec = round(time.perf_counter() - t0, 2)
        opdocs = n_new if name in ("prepare_incremental",
                                   "exact_match_index") else args.docs
        res[name] = {"sec": sec, "rows": n,
                     "docs_per_sec": round(opdocs / sec)}
        print(f"# {name}: {sec}s, {n} rows", file=sys.stderr, flush=True)
    ray.shutdown()
    print(json.dumps({"docs": args.docs, "mb_parquet": mb, "gen_sec": gen_sec,
                      "num_cpus": num_cpus, "ops": res}))


if __name__ == "__main__":
    main()
