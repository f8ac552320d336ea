#!/usr/bin/env python
"""Scaling measurement for the end-to-end corpus curation pipeline.

Grows the sf0.1 documents table by whole-corpus replication (replica
docs keep their text verbatim, so every replica is an EXACT duplicate
of its original — the dedup stages absorb the growth: exact dedup
should collapse the corpus back to ~1x before the minhash stage runs).
Reports per-stage wall at each size.

Usage: python tools/scale_corpus_pipeline.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from medallion_data_pipeline_spark.plans.corpus import run_corpus_pipeline
from medallion_data_pipeline_spark.session import get_spark
from medallion_data_pipeline_spark.sources.testdata import load_table


def main() -> None:
    spark = get_spark("scale-corpus", shuffle_partitions=32)
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    for replicas in (1, 4, 10):
        src = tempfile.mkdtemp(prefix="corpus_src_")
        out = tempfile.mkdtemp(prefix="corpus_out_")
        try:
            parts = [base.select("doc_id", "text", "lang", "source", "n_chars")]
            for r in range(1, replicas):
                parts.append(parts[0].withColumn(
                    "doc_id", F.col("doc_id") + r * 10_000_000))
            grown = parts[0]
            for p in parts[1:]:
                grown = grown.unionByName(p)
            grown.write.mode("overwrite").parquet(f"{src}/documents.parquet")

            results = run_corpus_pipeline(spark, src, out)
            stages = " ".join(
                f"{r.stage}={r.rows_in}->{r.rows_out}@{r.wall_s}s"
                for r in results)
            total = round(sum(r.wall_s for r in results), 1)
            print(f"replicas={replicas} total={total}s  {stages}")
        finally:
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
