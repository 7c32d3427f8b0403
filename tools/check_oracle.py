"""Local mimic of the driver's correctness gate: run each queries() entry
via Spark and its oracle_sql() via DuckDB on the same sf dir; compare
row count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    """Type-sensitive value hash mimicking the driver's compare: sort columns
    by name, sort rows, then hash the repr of every cell.  int64 1 and
    float64 1.0 hash DIFFERENTLY (the round-1 HUGEINT lesson: DuckDB sum()
    over BIGINT returns HUGEINT -> pandas float64/object -> hash mismatch
    even when values are numerically equal)."""
    import hashlib

    c = canon(df)
    h = hashlib.sha256()
    for row in c.itertuples(index=False, name=None):
        h.update(repr(row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from lucene_solr_spark.session import get_spark

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    spark = get_spark("check_oracle", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        a, b = canon(sdf), canon(odf)
        status = None
        if list(a.columns) != list(b.columns):
            status = f"schema mismatch: spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            status = f"row count: spark={len(a)} duck={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                status = "values differ: " + str(e).split("\n")[-2][:200]
            # driver-faithful: hash is type-sensitive even when values match
            if status is None and value_hash(sdf) != value_hash(odf):
                dt = {
                    c: (str(sdf[c].dtype), str(odf[c].dtype))
                    for c in sorted(sdf.columns)
                    if str(sdf[c].dtype) != str(odf[c].dtype)
                }
                status = f"type-sensitive hash mismatch (dtype diffs: {dt})"
        if status:
            print(f"FAIL {name}: {status}")
            if len(a) and len(b) and list(a.columns) == list(b.columns):
                merged = a.merge(b, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(10).to_string())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
