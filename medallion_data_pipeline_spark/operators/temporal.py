"""Temporal join operators Spark lacks natively: as-of join and
bounded range join (guide 'Common OLAP patterns'; SURVEY §2.3 notes the
reference has neither — these are engine extensions for time-series /
event workloads).

Both are built so the SHUFFLE is an equi-join, never an inequality
cross join:

- as-of join: union both sides, one window sort per key, carry the
  last right-side value forward (the classic distributed as-of plan;
  beats per-group merge_asof because no Python and no group blow-up).
- range join: bucketize the time axis, equi-join on (key, bucket) for
  the 2 adjacent buckets that can satisfy the bound, then filter the
  exact predicate. Work is proportional to real matches per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              value_cols: list[str], strict: bool = False) -> DataFrame:
    """For every left row, attach the right row's ``value_cols`` with the
    greatest ``right_ts`` <= ``left_ts`` (or < when strict) for the same
    ``key``. NULLs when no prior right row exists.

    Plan: tag sides -> unionByName -> one window per key ordered by
    (ts, side) -> last(ignorenulls) carry-forward -> keep left rows.
    One shuffle on key; the sort is local per partition.
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = (
        right.select(key, right_ts, *value_cols)
        .withColumn("_side", F.lit(0))
        .withColumn("_ts", F.col(right_ts))
    )
    # align schemas: left keeps its columns, right contributes values
    carried = [f"_r_{c}" for c in value_cols]
    rt = rt.select(
        F.col(key), F.col("_ts"), F.col("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    lt_aligned = lt.select(
        "*", *[F.lit(None).cast(dict(rt.dtypes)[f"_r_{c}"]).alias(f"_r_{c}") for c in value_cols]
    )
    rt_aligned = rt.select(
        *[F.lit(None).cast(t).alias(c) if c not in (key, "_ts", "_side") and c not in carried
          else F.col(c) for c, t in lt_aligned.dtypes]
    )
    both = lt_aligned.unionByName(rt_aligned)
    # strict: left rows sort BEFORE right rows at equal ts, so an equal-ts
    # right row is not yet visible; non-strict: right first.
    side_order = F.asc("_side") if not strict else F.desc("_side")
    w = (
        W.partitionBy(key)
        .orderBy(F.asc("_ts"), side_order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    for c in value_cols:
        both = both.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    out = both.filter(F.col("_side") == 1).drop("_side", "_ts")
    for c in value_cols:
        out = out.withColumnRenamed(f"_r_{c}", f"asof_{c}")
    return out


def range_join_count(left: DataFrame, right: DataFrame, key: str,
                     left_ts: str, right_ts: str,
                     window_ms: int) -> DataFrame:
    """Count right rows with ``right_ts`` in (left_ts, left_ts +
    window_ms] per left row — bucketed so the join is an equi-join on
    (key, bucket) over at most 2 adjacent buckets.
    """
    lb = left.withColumn("_ms", F.unix_millis(left_ts))
    rb = right.select(
        F.col(key).alias("_rkey"),
        F.unix_millis(right_ts).alias("_rms"),
    ).withColumn("_rbucket", (F.col("_rms") / window_ms).cast("long"))

    exploded = lb.withColumn(
        "_bucket",
        F.explode(F.array((F.col("_ms") / window_ms).cast("long"),
                          (F.col("_ms") / window_ms).cast("long") + 1)),
    )
    joined = exploded.join(
        rb,
        (F.col(key) == F.col("_rkey")) & (F.col("_bucket") == F.col("_rbucket")),
        "left",
    ).withColumn(
        "_hit",
        F.when((F.col("_rms") > F.col("_ms")) & (F.col("_rms") <= F.col("_ms") + window_ms), 1)
        .otherwise(0),
    )
    group_cols = [c for c in left.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.sum("_hit").cast("long").alias("n_following"))
    )
