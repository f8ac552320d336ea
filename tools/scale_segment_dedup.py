#!/usr/bin/env python
"""Scaling measurement for the span-dedup tier (exact_segment_dedup +
duplicate_span_intervals).

Grows the sf0.1 documents table by whole-corpus replication (replica
docs keep their text verbatim, so every span of a replicated doc
collides with the original — the worst-case boilerplate regime: the
per-segment-hash first-occurrence groups grow linearly with the
replica count). Reports min-of-3 warm wall per corpus size, mirroring
the grown-corpus experiments in docs/PERFORMANCE.md.

Usage: python tools/scale_segment_dedup.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from medallion_data_pipeline_spark.operators.dedup import (
    duplicate_span_intervals,
    exact_segment_dedup,
)
from medallion_data_pipeline_spark.session import get_spark
from medallion_data_pipeline_spark.sources.testdata import load_table


def grown(docs, replicas: int):
    parts = [docs]
    for r in range(1, replicas):
        parts.append(docs.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"), "text"))
    out = parts[0].select("doc_id", "text")
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark("scale-segment-dedup", shuffle_partitions=32)
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    for replicas in (1, 4, 10):
        corpus = grown(base, replicas).persist()
        n = corpus.count()
        walls = []
        for _ in range(3):
            t0 = time.time()
            res = exact_segment_dedup(corpus)
            total_dropped = res.agg(
                F.sum("n_dup_segments").alias("d"),
                F.sum("n_segments").alias("s")).collect()[0]
            walls.append(time.time() - t0)
        walls_sp = []
        for _ in range(3):
            t0 = time.time()
            sp = duplicate_span_intervals(corpus)
            sp_tot = sp.agg(
                F.sum("dup_tokens").alias("d"),
                F.sum("n_tokens").alias("t")).collect()[0]
            walls_sp.append(time.time() - t0)
        corpus.unpersist()
        print(f"docs={n} dup_segments={total_dropped['d']}/{total_dropped['s']} "
              f"wall_min3={min(walls):.1f}s | span_intervals "
              f"dup_tokens={sp_tot['d']}/{sp_tot['t']} "
              f"wall_min3={min(walls_sp):.1f}s")


if __name__ == "__main__":
    main()
