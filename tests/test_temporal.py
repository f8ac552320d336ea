"""Edge-case tests for the as-of / range / salted join operators."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from medallion_data_pipeline_spark.operators.skew import salted_join
from medallion_data_pipeline_spark.operators.temporal import asof_join, range_join_count


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_basic_and_no_prior(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:00")),
         (1, 101, _ts("2024-01-01 12:00:00")),
         (2, 200, _ts("2024-01-01 09:00:00"))],   # user 2 has no prior right row
        "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30:00"), 7.0),
         (1, _ts("2024-01-01 11:00:00"), 9.0),
         (2, _ts("2024-01-01 09:30:00"), 5.0)],   # after user 2's left row
        "user_id long, ts timestamp, v double")
    out = {r.event_id: r.asof_v for r in
           asof_join(left, right, "user_id", "ts", "ts", ["v"]).collect()}
    assert out == {100: 7.0, 101: 9.0, 200: None}


def test_asof_join_equal_ts_semantics(spark):
    left = spark.createDataFrame([(1, 100, _ts("2024-01-01 10:00:00"))],
                                 "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"), 3.0)],
                                  "user_id long, ts timestamp, v double")
    inclusive = asof_join(left, right, "user_id", "ts", "ts", ["v"]).collect()[0]
    assert inclusive.asof_v == 3.0           # ts >= semantics
    strict = asof_join(left, right, "user_id", "ts", "ts", ["v"], strict=True).collect()[0]
    assert strict.asof_v is None             # ts > semantics


def test_range_join_count_window_edges(spark):
    left = spark.createDataFrame([(1, 10, _ts("2024-01-01 10:00:00"))],
                                 "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")),     # not counted: strictly after only
         (1, _ts("2024-01-01 10:03:00")),     # counted
         (1, _ts("2024-01-01 10:05:00")),     # counted: inclusive upper bound
         (1, _ts("2024-01-01 10:05:01")),     # outside
         (2, _ts("2024-01-01 10:01:00"))],    # other key
        "user_id long, ts timestamp")
    out = range_join_count(left, right, "user_id", "ts", "ts", window_ms=300000).collect()
    assert out[0].n_following == 2


def test_salted_join_equals_plain_join(spark):
    big = spark.range(1000).select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(i, f"g{i}") for i in range(7)], "k long, grp string")
    salted = salted_join(big, small, "k").groupBy("grp").agg(F.sum("v").alias("s"))
    plain = big.join(small, "k").groupBy("grp").agg(F.sum("v").alias("s"))
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_testdata_schema_drift_guard(spark):
    """Round-start canary: the driver regenerates /root/testdata between
    rounds and physical types have drifted twice (TIMESTAMP(NANOS) ->
    long in r1, TIMESTAMP_NTZ in r3). load_table must normalize every
    table to the logical schema the queries and oracles assume,
    whatever the parquet writer did."""
    from pyspark.sql import types as T

    from medallion_data_pipeline_spark.sources.testdata import TABLES, load_table

    # events.ts feeds instant functions (unix_millis — the r3 crash was
    # unix_millis on NTZ), so it MUST normalize to TimestampType; pure
    # date columns only feed tz-independent date arithmetic, where both
    # Timestamp flavors agree with the oracle's naive reading.
    date_like = (T.TimestampType(), T.TimestampNTZType(), T.DateType())
    expected = {
        "events": {"ts": (T.TimestampType(),)},
        "orders": {"o_orderdate": date_like},
        "lineitem": {"l_shipdate": date_like},
        "embeddings": {"embedding": (T.ArrayType(T.FloatType(), True),
                                     T.ArrayType(T.DoubleType(), True))},
    }
    for name in TABLES:
        df = load_table(spark, "/root/testdata/sf0.001", name)
        assert df.count() > 0, name
        fields = {f.name: f.dataType for f in df.schema.fields}
        for col, want in expected.get(name, {}).items():
            assert fields[col] in want, (name, col, fields[col])
