#!/usr/bin/env python
"""Scaling measurement for the block-offset distributed windows.

Grows the sf0.1 events and orders tables 10x by key-shifted
replication (event/order ids offset per replica, event timestamps
shifted a year per replica so the replicas are distinct streams),
lands the grown tables as multi-file parquet, and times the two
formerly-global-window queries at 1x and 10x (min-of-3 warm):

- event_id_islands  (gaps-and-islands row_number, blocked by id range)
- quartile_bins     (exact ntile(4), blocked by price range)

The point: before round 5 both funneled every fact row through ONE
partition (WindowExec "No Partition Defined"), so wall would scale
super-linearly with a hard memory ceiling. With block-offset row
numbers the heavy window is partitioned and only the per-block counts
frame (rows = #blocks) crosses a single partition — wall should track
volume ~linearly.

Usage: python tools/scale_windows.py [workdir=/tmp/scale_win10]
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

QUERIES = ("event_id_islands", "quartile_bins")
REPLICAS = 10
ID_OFFSET = 100_000_000


def build_grown(spark, src_dir: str, out_dir: str) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for name in TABLES:
        df = load_table(spark, src_dir, name)
        if name == "events":
            parts = [df]
            for r in range(1, REPLICAS):
                parts.append(
                    df.withColumn("event_id", F.col("event_id") + r * ID_OFFSET)
                    .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {r} YEAR")))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            df = out.repartition(32)
        elif name == "orders":
            parts = [df]
            for r in range(1, REPLICAS):
                parts.append(
                    df.withColumn("o_orderkey", F.col("o_orderkey") + r * ID_OFFSET))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            df = out.repartition(32)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    from medallion_data_pipeline_spark.queries import REGISTRY, _load

    _load()
    walls: dict[str, float] = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        walls[name] = round(best, 2)
    return walls


def main() -> int:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_win10"
    src = "/root/testdata/sf0.1"
    spark = get_spark("scale-windows", 32)

    build_grown(spark, src, workdir)
    one = time_queries(spark, src)
    ten = time_queries(spark, workdir)
    for q in QUERIES:
        ratio = round(ten[q] / one[q], 2) if one[q] else float("nan")
        print(f"{q:24s} 1x={one[q]:6.2f}s  10x={ten[q]:6.2f}s  ratio={ratio}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
