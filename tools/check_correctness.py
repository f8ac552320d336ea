#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every registered query through BOTH the Spark engine and the
DuckDB oracle at sf0.01 (overridable), compares row count, column-name
set, and an order-insensitive value hash, and prints one line per
query. Use during development; the driver does the authoritative run.

Usage:
    python tools/check_correctness.py              # all queries
    python tools/check_correctness.py q1 q2 ...    # subset
    SF_DIR=/root/testdata/sf0.001 python tools/check_correctness.py
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.6f}"
            return repr(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        try:
            import decimal
            if isinstance(v, decimal.Decimal):
                return f"{float(v):.6f}" if v == v.to_integral_value() else repr(float(v))
        except Exception:
            pass
        return str(v)

    return df.map(norm_cell)


def value_hash(df: pd.DataFrame) -> str:
    c = canonicalize(df)
    rows = ["\x1f".join(r) for r in c.itertuples(index=False, name=None)]
    rows.sort()
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    from medallion_data_pipeline_spark.queries import REGISTRY, _load
    from medallion_data_pipeline_spark.session import get_spark
    from medallion_data_pipeline_spark.sources.testdata import TABLES

    _load()
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    spark = get_spark("check-correctness", shuffle_partitions=16)
    con = duckdb.connect()
    for name in TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        # each query is a stand-alone unit: drop caches persisted by the
        # previous query (minhash/simhash staged frames etc.) so a full
        # sequential run measures each query cold rather than degrading
        # under 115 queries' accumulated cached partitions
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name:34s} spark error: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"ROWS  {name:34s} rows={len(sdf)} (no oracle) {time.time()-t0:5.1f}s")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(q.oracle).df()
        except Exception as e:
            print(f"FAIL  {name:34s} oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append(f"hash {hs} vs {ho}")
                # show a sample diff to debug
                cs, co = canonicalize(sdf), canonicalize(odf)
                ks = set(map(tuple, cs.itertuples(index=False, name=None)))
                ko = set(map(tuple, co.itertuples(index=False, name=None)))
                only_s = list(ks - ko)[:2]
                only_o = list(ko - ks)[:2]
                for r in only_s:
                    print(f"        spark-only: {r}")
                for r in only_o:
                    print(f"        oracle-only: {r}")
        if problems:
            print(f"FAIL  {name:34s} {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name:34s} rows={len(sdf)} {time.time()-t0:5.1f}s")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
