#!/usr/bin/env python
"""Driver-parity self-check: run every ``__ray_entry__.queries()`` entry and
its ``oracle_sql()`` twin side-by-side (DuckDB over the same parquet tables),
compare row count + schema + order-insensitive value hash — a local replica
of the driver's CORRECTNESS gate.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(x) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x.to_pandas()  # Dataset


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive hash: sort columns by name, canonicalize values,
    sort rows, hash. Floats rounded to 6 significant-ish decimals."""
    import hashlib

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            df[c] = np.round(s.astype(np.float64), 6)
        elif s.dtype.kind in "iu":
            df[c] = s.astype(np.int64, errors="ignore")
        elif s.dtype == object or str(s.dtype) == "string":
            df[c] = s.astype(str)
    rows = sorted(tuple(r) for r in df.itertuples(index=False, name=None))
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 object_store_memory=3_000_000_000)

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            continue
        if name not in sqls:
            print(f"ok?  {name}: rows-only ({len(mine)} rows, no SQL oracle)")
            continue
        try:
            ref = con.execute(sqls[name]).df()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            continue
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} vs {len(ref)}")
        if sorted(mine.columns) != sorted(ref.columns):
            problems.append(f"cols {sorted(mine.columns)} vs {sorted(ref.columns)}")
        elif value_hash(mine) != value_hash(ref):
            problems.append("value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name} ({len(mine)} rows)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
