"""Keyed upsert / MERGE emulation without a Delta runtime.

The reference's S3 sink is `INSERT ... ON CONFLICT (pk) DO UPDATE` per
row (bronze/data_loader.py:112-119). With plain parquet the idempotent
equivalent is anti-join + union (guide 'CDC/SCD2' pattern): updates win
on key collision, unmatched target rows survive. When a Delta/Iceberg
runtime is on the classpath, swap for a real `MERGE INTO` — the
interface here is deliberately the same shape.

SCD2 variant keeps history: colliding target rows are closed out with
an end timestamp instead of dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, pk: str | list[str]) -> DataFrame:
    """Last-write-wins MERGE: updates replace matching target rows,
    everything else passes through. One shuffle on pk (the anti join);
    at scale bucket both sides on pk so the anti join co-locates."""
    keys = [pk] if isinstance(pk, str) else list(pk)
    kept = target.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)


def scd2_upsert(target: DataFrame, updates: DataFrame, pk: str | list[str],
                effective_col: str = "effective_from",
                end_col: str = "effective_to") -> DataFrame:
    """Slowly-changing-dimension type 2: close out matched current rows
    (set end timestamp) and append the new versions as current."""
    keys = [pk] if isinstance(pk, str) else list(pk)
    now = F.current_timestamp()

    current = target.filter(F.col(end_col).isNull())
    history = target.filter(F.col(end_col).isNotNull())

    matched_keys = updates.select(*keys)
    closed = (
        current.join(matched_keys, on=keys, how="left_semi")
        .withColumn(end_col, now)
    )
    untouched = current.join(matched_keys, on=keys, how="left_anti")
    fresh = updates.withColumn(effective_col, now).withColumn(
        end_col, F.lit(None).cast("timestamp"))
    return history.unionByName(closed).unionByName(untouched).unionByName(fresh)
