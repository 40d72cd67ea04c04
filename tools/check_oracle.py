"""Local replica of the driver's correctness gate: run each
``queries()`` entry and its ``oracle_sql()`` side-by-side on DuckDB,
compare row count + schema + order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) in ("int32", "int16", "int8"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("datetime64"):
            # unit normalization only (ns vs us); driver hash is
            # unit-insensitive (orders_dates passed r1 with this skew)
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows  {name}: {len(ours)} rows (no oracle) [{dt:.1f}s]")
            continue
        oracle = canon(con.sql(sqls[name]).df())
        if len(ours) != len(oracle):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(ours)} vs oracle {len(oracle)} [{dt:.1f}s]")
            continue
        if list(ours.columns) != list(oracle.columns):
            failures.append(name)
            print(f"FAIL  {name}: cols {list(ours.columns)} vs {list(oracle.columns)}")
            continue
        try:
            # check_dtype=True: the driver hashes raw values, so an int64
            # engine column vs a float64 oracle column (e.g. DuckDB
            # sum(BIGINT) -> HUGEINT -> float64) must FAIL here too.
            pd.testing.assert_frame_equal(ours, oracle, check_dtype=True, check_exact=True)
            print(f"OK    {name}: {len(ours)} rows [{dt:.1f}s]")
        except AssertionError as ex:
            failures.append(name)
            print(f"FAIL  {name}: value mismatch [{dt:.1f}s]")
            print(str(ex).split("\n")[0:6])
    ray.shutdown()
    print("\nFAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
