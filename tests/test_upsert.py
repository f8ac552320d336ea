"""MERGE/SCD2 upsert emulation tests (SURVEY S3 without Delta)."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_pipeline_spark.operators.upsert import merge_upsert, scd2_upsert


def test_merge_upsert_last_write_wins(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    updates = spark.createDataFrame([(2, "B2"), (4, "d")], "id long, v string")
    out = {r.id: r.v for r in merge_upsert(target, updates, "id").collect()}
    assert out == {1: "a", 2: "B2", 3: "c", 4: "d"}


def test_merge_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, "a")], "id long, v string")
    updates = spark.createDataFrame([(1, "A")], "id long, v string")
    once = merge_upsert(target, updates, "id")
    twice = merge_upsert(once, updates, "id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_upsert_keeps_history(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).withColumn("effective_from", F.current_timestamp()) \
     .withColumn("effective_to", F.lit(None).cast("timestamp"))
    updates = spark.createDataFrame([(1, "A2")], "id long, v string")
    out = scd2_upsert(target, updates, "id")
    rows = out.collect()
    assert len(rows) == 3  # closed v1 of id 1, untouched id 2, new id 1
    current = {r.id: r.v for r in out.filter(F.col("effective_to").isNull()).collect()}
    assert current == {1: "A2", 2: "b"}
    closed = out.filter(F.col("effective_to").isNotNull()).collect()
    assert len(closed) == 1 and closed[0].v == "a"
