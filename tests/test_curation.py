"""Corpus-curation operator tests (stages/curation.py): independent python
oracles for the repetition metrics / decontamination / semantic dedup, and a
planted-PII corpus checked BOTH against hand counts and against the DuckDB
oracle SQL (the driver corpus contains no PII, so the planted table is where
the regex semantics are actually exercised)."""

import os
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from powergraph_ray.pipelines import oracle as osql
from powergraph_ray.stages.curation import (
    RepetitionStats,
    decontaminate,
    pii_stats,
    redact_pii,
    semantic_dedup,
    token_df,
)
from powergraph_ray.stages.text import TOKEN_RE, doc_profile, lang_id, quality_scores, token_stats

SF = "/root/testdata/sf0.001"


def _docs(sf=SF):
    return ray.data.read_parquet(os.path.join(sf, "documents.parquet"),
                                 columns=["doc_id", "text"])


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------


def _rep_oracle(text: str) -> tuple:
    toks = TOKEN_RE.findall(text.lower())
    n = len(toks)

    def fr(num, den):
        return round(num / den, 6) if den else 0.0

    c = Counter(toks)
    g2 = list(zip(toks, toks[1:]))
    g3 = list(zip(toks, toks[1:], toks[2:]))
    return (n,
            fr(n - len(c), n),
            fr(max(c.values()) if c else 0, n),
            fr(len(g2) - len(set(g2)), len(g2)),
            fr(len(g3) - len(set(g3)), len(g3)))


@pytest.mark.parametrize("text", [
    "",
    "one",
    "a a a a",
    "a b a b a b",
    "w x y z",
    "spam spam eggs spam bacon spam",
    "to be or not to be that is the question to be or not",
])
def test_repetition_hand_oracle(text):
    out = RepetitionStats()(pd.DataFrame({"doc_id": [0], "text": [text]}))
    n, dw, tw, d2, d3 = _rep_oracle(text)
    row = out.iloc[0]
    assert row["n_tokens"] == n
    np.testing.assert_allclose(
        [row["dup_word_frac"], row["top_word_frac"],
         row["dup_2gram_frac"], row["dup_3gram_frac"]],
        [dw, tw, d2, d3], atol=5e-7)


def test_repetition_batch_matches_rowwise():
    """Batch vectorization must be invariant to batch composition."""
    texts = ["a b c a b c", "", "x", "q q q", "m n m n o"]
    batch = RepetitionStats()(pd.DataFrame({"doc_id": range(5), "text": texts}))
    for i, t in enumerate(texts):
        single = RepetitionStats()(pd.DataFrame({"doc_id": [i], "text": [t]}))
        pd.testing.assert_frame_equal(
            batch.iloc[[i]].reset_index(drop=True), single.reset_index(drop=True))


# ---------------------------------------------------------------------------
# PII on a planted corpus
# ---------------------------------------------------------------------------

PLANTED = [
    "contact me at alice@example.com for details",
    "two mails bob@site.org and carol.j+tag@sub.domain.co here",
    "server at 10.0.0.1 and 192.168.255.3 responded",
    "call +1 555 867-5309 or 020-555 1234 now",
    "no pii in this row at all",
    "mixed bag: d@ex.io on 127.0.0.1 dial 1-555 5551",
    "",
]


def _planted_path(tmp_path) -> str:
    p = str(tmp_path / "documents.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(len(PLANTED)), pa.int64()),
                             "text": pa.array(PLANTED, pa.string())}), p)
    return p


def test_pii_planted_counts(tmp_path):
    out = (pii_stats(ray.data.read_parquet(_planted_path(tmp_path)))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_emails"].tolist() == [1, 2, 0, 0, 0, 1, 0]
    assert out["n_ipv4"].tolist() == [0, 0, 2, 0, 0, 1, 0]
    assert out["n_phones"].tolist()[0:3] == [0, 0, 0]
    assert out["n_phones"][3] >= 1  # "+1 555 867-5309"
    # redaction shortens exactly the rows with matches
    assert (out["clean_chars"][4] == len(PLANTED[4]))


def test_pii_matches_sql_on_planted(tmp_path):
    """Engine (pyarrow RE2) vs DuckDB (RE2) on text that actually contains
    PII — the regex-semantics parity the driver corpus can't exercise."""
    p = _planted_path(tmp_path)
    got = (pii_stats(ray.data.read_parquet(p))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(osql.sql_doc_pii()).fetchdf().sort_values("doc_id").reset_index(drop=True)
    for c in ["n_emails", "n_ipv4", "n_phones", "clean_chars"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(),
                                      err_msg=c)


def test_redact_pii_roundtrip(tmp_path):
    red = (redact_pii(ray.data.read_parquet(_planted_path(tmp_path)))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert "[EMAIL]" in red["text"][0] and "alice" not in red["text"][0]
    assert "[IP]" in red["text"][2] and "10.0.0.1" not in red["text"][2]
    assert red["text"][4] == PLANTED[4]


# ---------------------------------------------------------------------------
# token document-frequency
# ---------------------------------------------------------------------------


def test_token_df_hand_oracle():
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"),
                           columns=["doc_id", "text"])
    c = Counter()
    for t in docs["text"]:
        c.update(set(TOKEN_RE.findall(t.lower())))
    want = {w: n for w, n in c.items() if n >= 2}
    got = token_df(_docs(), min_df=2).to_pandas()
    assert dict(zip(got["token"], got["df"])) == want


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_hand_oracle():
    from powergraph_ray.stages.dedup import _shingle_hashes
    from powergraph_ray.stages.text import batch_token_hashes

    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"),
                           columns=["doc_id", "text"])
    whs = batch_token_hashes(docs["text"].tolist())
    shs = {int(i): set(_shingle_hashes(w, 3).tolist())
           for i, w in zip(docs["doc_id"], whs)}
    bench = set().union(*(s for i, s in shs.items() if i % 17 == 0))
    got = (decontaminate(_docs(), bench_mod=17, threshold=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (got["doc_id"] % 17 != 0).all()
    for _, r in got.sample(50, random_state=0).iterrows():
        s = shs[int(r["doc_id"])]
        hits = len(s & bench)
        assert r["n_shingles"] == len(s)
        assert r["n_hits"] == hits
        assert r["contaminated"] == int(hits / len(s) >= 0.5)
    # benchmark docs never scored; all docs with shingles present
    assert len(got) == sum(1 for i, s in shs.items() if i % 17 != 0 and s)


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------


def test_semantic_dedup_sequential_oracle():
    from powergraph_ray.stages.kmeans import kmeans_oracle

    emb = pd.read_parquet(os.path.join(SF, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    x = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    _, assign, _ = kmeans_oracle(x, ids, k=8, iterations=5)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)

    # sequential closure: within-cluster pairs with cos >= threshold
    want_rows = {}
    for c in range(8):
        idx = np.flatnonzero(assign == c)
        if len(idx) < 2:
            continue
        sims = xn[idx] @ xn[idx].T
        parent = {int(v): int(v) for v in idx}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        ii, jj = np.nonzero(np.triu(sims >= 0.45, k=1))
        for a, b in zip(idx[ii], idx[jj]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        groups = {}
        for v in idx:
            groups.setdefault(find(int(v)), []).append(int(v))
        for members in groups.values():
            if len(members) > 1:
                canon = int(ids[members].min())
                for m in members:
                    want_rows[int(ids[m])] = (canon, c)

    emb_ds = ray.data.read_parquet(os.path.join(SF, "embeddings.parquet"),
                                   columns=["vec_id", "embedding"])
    got = semantic_dedup(emb_ds, n_clusters=8, iterations=5,
                         threshold=0.45).to_pandas()
    got_rows = {int(r["vec_id"]): (int(r["canonical_id"]), int(r["cluster"]))
                for _, r in got.iterrows()}
    assert got_rows == want_rows
    assert len(want_rows) > 0  # the fixture must actually contain near-dups


# ---------------------------------------------------------------------------
# fused doc profile ≡ the three component stages
# ---------------------------------------------------------------------------


def test_doc_profile_equals_components():
    prof = doc_profile(_docs()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ts = token_stats(_docs()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    qs = quality_scores(_docs()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    li = lang_id(_docs()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_array_equal(prof["n_tokens"], ts["n_tokens"])
    np.testing.assert_array_equal(prof["n_chars"], ts["n_chars"])
    np.testing.assert_array_equal(prof["n_stopwords"], qs["n_stopwords"])
    np.testing.assert_array_equal(prof["n_punct"], qs["n_punct"])
    np.testing.assert_allclose(prof["stop_ratio"], qs["stop_ratio"], atol=0)
    np.testing.assert_array_equal(prof["lang_pred"], li["lang_pred"])


def test_duplicate_spans_matches_bruteforce_oracle():
    """Planted corpus: shared sentence fragments across docs → spans equal
    a brute-force (kgram → doc-set → position-union) recomputation."""
    import ray.data

    from powergraph_ray.stages.curation import duplicate_spans
    from powergraph_ray.stages.text import TOKEN_RE

    k = 3
    texts = {
        0: "a b c d e f g h i j",
        1: "x y a b c d e z w q",          # shares "a b c d e" with doc 0
        2: "p q2 r s t u v unique only",
        3: "a b c d e f g h i j",          # exact copy of doc 0
        4: "m n o a b c",                   # shares trailing "a b c"
        5: "tiny",                          # < k tokens: no spans
    }
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    got = duplicate_spans(ds, k=k, min_df=2).to_pandas() \
        .sort_values(["doc_id", "start"]).reset_index(drop=True)

    # brute-force oracle over token tuples
    toks = {d: TOKEN_RE.findall(t.lower()) for d, t in texts.items()}
    from collections import defaultdict
    docs_of = defaultdict(set)
    for d, ws in toks.items():
        for i in range(len(ws) - k + 1):
            docs_of[tuple(ws[i:i + k])].add(d)
    want = []
    for d, ws in toks.items():
        marked = [i for i in range(len(ws) - k + 1)
                  if len(docs_of[tuple(ws[i:i + k])]) >= 2]
        # merge fixed-length windows into maximal spans
        for i, p in enumerate(marked):
            if i == 0 or p - marked[i - 1] > k:
                want.append([d, p, p + k])
            else:
                want[-1][2] = p + k
    want = pd.DataFrame(want, columns=["doc_id", "start", "end"]) \
        .sort_values(["doc_id", "start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


# ---------------------------------------------------------------------------
# cross-document line-level dedup
# ---------------------------------------------------------------------------

BOILER = "Subscribe to our newsletter!"
LICENSE = "  licensed under the apache license  "  # trims+lowers to one form


def _lined_corpus(tmp_path) -> str:
    texts = [
        f"{BOILER}\nunique body one\n{LICENSE}",
        f"{BOILER}\nunique body two\n\nLicensed Under The Apache License",
        "unique body three\n" + BOILER,
        "only unique content here\n\n\nand more",
        "",                      # empty doc: 1 empty line, kept
        BOILER,                  # doc that IS one boilerplate line
    ]
    p = str(tmp_path / "lined_documents.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                             "text": pa.array(texts, pa.string())}), p)
    return p


def _line_dedup_parity(path: str, min_df: int = 2):
    from powergraph_ray.stages.curation import line_dedup

    got = (line_dedup(ray.data.read_parquet(path), min_df=min_df)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    want = (con.execute(osql.sql_line_dedup(min_df)).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    np.testing.assert_array_equal(got["n_lines"], want["n_lines"])
    np.testing.assert_array_equal(got["n_dropped"], want["n_dropped"])
    return got


def test_line_dedup_planted(tmp_path):
    got = _line_dedup_parity(_lined_corpus(tmp_path))
    # the two normalized-identical boilerplate forms are both dropped
    assert got.loc[0, "text"] == "unique body one"
    assert got.loc[0, "n_dropped"] == 2
    assert got.loc[1, "text"] == "unique body two\n"  # empty line survives
    assert got.loc[3, "n_dropped"] == 0               # untouched doc
    assert got.loc[4, "text"] == "" and got.loc[4, "n_lines"] == 1
    assert got.loc[5, "text"] == "" and got.loc[5, "n_dropped"] == 1


def test_line_dedup_sf_corpus():
    """Driver-shaped corpus: single-line docs with all-distinct texts —
    a no-drop pass-through the engine must still match row-for-row."""
    got = _line_dedup_parity(os.path.join(SF, "documents.parquet"))
    assert (got["n_dropped"] == 0).all() and (got["n_lines"] == 1).all()
