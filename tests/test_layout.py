"""Physical layout tests: partition pruning and bucketed shuffle-free
joins, asserted from the actual physical plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_data_pipeline_spark.sources import layout
from medallion_data_pipeline_spark.sources.testdata import load_table


def test_partitioned_write_prunes(spark, tmp_path):
    orders = load_table(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "order_year", F.year("o_orderdate"))
    path = str(tmp_path / "orders_part")
    layout.write_partitioned(orders, path, ["order_year"])

    df = spark.read.parquet(path).filter(F.col("order_year") == 1995)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # only the 1995 partition directory is scanned
    assert df.count() == orders.filter(F.year("o_orderdate") == 1995).count()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = load_table(spark, "/root/testdata/sf0.001", "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey")
    layout.write_bucketed_table(orders, "b_orders", "o_orderkey", n_buckets=4,
                                path=str(tmp_path / "b_orders"))
    layout.write_bucketed_table(lineitem, "b_lineitem", "o_orderkey", n_buckets=4,
                                path=str(tmp_path / "b_lineitem"))

    # disable auto-broadcast so the join would otherwise need a shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = layout.shuffle_free_join_plan(spark, "b_orders", "b_lineitem", "o_orderkey")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan        # bucketing eliminated the shuffle
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_write_sized_bounds_file_count(spark, tmp_path):
    df = spark.range(10000).withColumn("v", F.rand(seed=1))
    path = str(tmp_path / "sized")
    layout.write_sized(df, path, target_file_mb=1, approx_row_bytes=100)
    import glob
    files = glob.glob(f"{path}/part-*")
    assert 1 <= len(files) <= 4


def test_clustered_write_produces_disjoint_file_ranges(spark, tmp_path):
    """write_clustered must yield files whose [min,max] ranges on the
    cluster column do not overlap — the property that makes parquet
    footer stats an effective skip index for range predicates."""
    import glob

    import pyarrow.parquet as pq

    from medallion_data_pipeline_spark.sources import layout as L
    from medallion_data_pipeline_spark.sources.testdata import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_clustered")
    L.write_clustered(events.select("event_id", "ts", "event_type"), out,
                      ["event_id"], n_files=4)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["event_id"]).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"
