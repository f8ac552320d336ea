#!/usr/bin/env python
"""Scaling measurement for the core mart/star queries.

Grows the sf0.1 fact tables (lineitem, orders) 10x by key-shifted
replication (order keys offset by 10M per replica so the orders ->
lineitem join keys stay consistent; dimension keys untouched so the
star joins hit the same broadcast dims), lands the grown corpus as
parquet, and times the four headline star queries at 1x and 10x
(min-of-3 warm). The point: the wall ratio of a plan whose shuffles
are all key-partial aggregations and broadcast joins should track data
volume ~linearly — a super-linear ratio exposes a hidden all-pairs or
driver-side bottleneck.

Usage: python tools/scale_pipeline.py [workdir=/tmp/scale10]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from medallion_data_pipeline_spark.session import get_spark
from medallion_data_pipeline_spark.sources.testdata import TABLES, load_table

QUERIES = ("pricing_summary", "monthly_sales", "supplier_performance",
           "dashboard_wide")
GROWN = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
OFFSET = 10_000_000


def build_grown(spark, src_dir: str, out_dir: str, replicas: int) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for name in TABLES:
        df = load_table(spark, src_dir, name)
        if name in GROWN:
            key = GROWN[name]
            parts = [df]
            for r in range(1, replicas):
                parts.append(df.withColumn(key, F.col(key) + r * OFFSET))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            df = out
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    from medallion_data_pipeline_spark.queries import REGISTRY, _load
    _load()
    out = {}
    for name in QUERIES:
        walls = []
        for _ in range(3):
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).count()
            walls.append(time.time() - t0)
        out[name] = min(walls)
    return out


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
    spark = get_spark("scale-pipeline", shuffle_partitions=32)
    src = "/root/testdata/sf0.1"
    base = time_queries(spark, src)
    build_grown(spark, src, workdir, replicas=10)
    grown_t = time_queries(spark, workdir)
    n1 = load_table(spark, src, "lineitem").count()
    n10 = load_table(spark, workdir, "lineitem").count()
    print(f"lineitem rows: 1x={n1} 10x={n10}")
    for q in QUERIES:
        print(f"{q}: 1x={base[q]:.2f}s 10x={grown_t[q]:.2f}s "
              f"ratio={grown_t[q] / base[q]:.1f}x")


if __name__ == "__main__":
    main()
