"""Local stand-in for the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() twin on DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

Usage: python tools/check_contract.py [--sf SF_DIR] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from wikidata_sparql_history_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("contract-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    failures = []
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK*   {name}: rows={len(sdf)} (no oracle, rows-only)"
                  f" [{time.monotonic()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        a, b = normalize(sdf), normalize(odf)
        status = None
        if list(a.columns) != list(b.columns):
            status = f"column mismatch: spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            status = f"row count mismatch: spark={len(a)} duck={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=False, atol=1e-6)
            except AssertionError as e:
                status = f"value mismatch: {str(e)[:300]}"
        if status:
            print(f"FAIL  {name}: {status}")
            failures.append(name)
        else:
            print(f"OK    {name}: rows={len(a)} [{time.monotonic()-t0:.1f}s]")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
