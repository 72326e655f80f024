"""bucketed_agg (stages/agg.py) vs a pandas global-groupby oracle: all four
kinds, string / int64 / uint64≥2^63 / multi keys, many buckets."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from powergraph_ray.stages.agg import bucketed_agg


def _check(df, keys, aggs, n_buckets=16):
    got = bucketed_agg(ray.data.from_pandas(df), keys, aggs,
                       n_buckets=n_buckets).to_pandas() \
        .sort_values(keys).reset_index(drop=True)
    gb = df.groupby(keys, sort=True)
    want = {}
    for out, (col, kind) in aggs.items():
        want[out] = gb.size() if kind == "count" else getattr(gb[col], kind)()
    want = pd.DataFrame(want).reset_index()[keys + list(aggs)] \
        .sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_bucketed_agg_int_keys_all_kinds():
    rng = np.random.default_rng(0)
    df = pd.DataFrame({"k": rng.integers(0, 500, 5000),
                       "v": rng.integers(-100, 100, 5000),
                       "w": rng.normal(size=5000)})
    _check(df, ["k"], {"s": ("v", "sum"), "mn": ("v", "min"),
                       "mx": ("v", "max"), "n": (None, "count"),
                       "ws": ("w", "sum")})


def test_bucketed_agg_uint64_beyond_int63_keys():
    rng = np.random.default_rng(1)
    base = np.uint64(1 << 63)
    keys = (base + rng.integers(0, 50, 2000).astype(np.uint64))
    df = pd.DataFrame({"k": keys, "v": rng.integers(0, 10, 2000)})
    got = bucketed_agg(ray.data.from_arrow(pa.table({
        "k": pa.array(keys, pa.uint64()),
        "v": pa.array(df["v"].to_numpy(), pa.int64())})),
        ["k"], {"s": ("v", "sum")}).to_pandas()
    want = df.groupby("k", sort=True)["v"].sum()
    got = got.sort_values("k").reset_index(drop=True)
    # keys must survive bit-exact above 2^63
    np.testing.assert_array_equal(got["k"].to_numpy(np.uint64),
                                  want.index.to_numpy(np.uint64))
    np.testing.assert_array_equal(got["s"].to_numpy(np.int64),
                                  want.to_numpy(np.int64))


def test_bucketed_agg_string_and_multi_keys():
    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "a": rng.choice(list("xyzw"), 3000),
        "b": rng.integers(0, 7, 3000),
        "v": rng.integers(0, 1000, 3000),
    })
    _check(df, ["a", "b"], {"s": ("v", "sum"), "n": (None, "count")})
    _check(df, ["a"], {"mx": ("v", "max")})
