"""Tiny-corpus DuckDB-vs-numpy checks for the generated hashing oracles
(sql_minhash_near_dups / sql_doc_fingerprints) — exercises the HUGEINT
mod-2^64 emulation, the staged splitmix64 CTEs, and the <k-token / empty-doc
edge cases without needing Ray or the sf test tables."""

import duckdb
import numpy as np
import pandas as pd

from powergraph_ray.ids import KNUTH_MIX, integer_mix, round_half_away
from powergraph_ray.pipelines.oracle import (sql_doc_fingerprints,
                                             sql_minhash_near_dups)
from powergraph_ray.stages.dedup import (MinHasher, _token_hasher,
                                         _word_hashes, ngram_jaccard)
from powergraph_ray.stages.text import Fingerprint

DOCS = pd.DataFrame({
    "doc_id": list(range(8)),
    "text": [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near dup of 0
        "completely different content here about graphs and rays",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "",                                              # no tokens
        "",                                              # pairs with 4 (j=1)
        "ab",                                            # <k tokens
        "ab cd",                                         # <k tokens
    ],
})


def _expected_minhash_pairs(threshold=0.5, bands=16, rpb=4):
    hasher = _token_hasher("md5")
    mh = MinHasher(token_hash="md5")
    sigs = {d: mh._sig_from_wh(_word_hashes(t, hasher))
            for d, t in zip(DOCS.doc_id, DOCS.text)}

    def band_codes(sig):
        s = np.asarray(sig, np.uint64).reshape(bands, rpb)
        with np.errstate(over="ignore"):
            h = integer_mix(s[:, 0])
            for r in range(1, rpb):
                h = integer_mix(h * np.uint64(KNUTH_MIX) ^ s[:, r])
        return h

    codes = {d: band_codes(s) for d, s in sigs.items()}
    out = []
    for a in DOCS.doc_id:
        for b in DOCS.doc_id:
            if a < b and (codes[a] == codes[b]).any():
                j = ngram_jaccard(DOCS.text[a], DOCS.text[b], 3, hasher=hasher)
                if j >= threshold:
                    out.append((a, b, float(round_half_away(j, 6))))
    return sorted(out)


def test_sql_minhash_matches_numpy_reference():
    con = duckdb.connect()
    con.register("documents", DOCS)
    got = sorted(con.execute(sql_minhash_near_dups(0.5)).fetchdf()
                 .itertuples(index=False, name=None))
    want = _expected_minhash_pairs(0.5)
    assert [(a, b, round(j, 6)) for a, b, j in got] == want
    # the planted near/exact dups and the empty-doc pair must be present
    pairs = {(a, b) for a, b, _ in got}
    assert {(0, 1), (0, 3), (1, 3), (4, 5)} <= pairs


def test_sql_fingerprints_match_engine_class():
    fp = Fingerprint(token_hash="md5")
    want = fp(DOCS).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", DOCS)
    got = (con.execute(sql_doc_fingerprints()).fetchdf()
           .sort_values("doc_id").reset_index(drop=True))
    np.testing.assert_array_equal(got["fingerprint"].to_numpy(np.uint64),
                                  want["fingerprint"].to_numpy(np.uint64))
    # empty doc → the FNV offset basis exactly
    assert int(got["fingerprint"][4]) == int(Fingerprint.OFFSET)
