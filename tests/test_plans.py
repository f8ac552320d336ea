"""Physical-plan regression tests: the scale properties PERFORMANCE.md
claims are pinned here from explain() output, so a refactor that
silently introduces a cartesian product, drops a broadcast, or breaks
filter pushdown fails CI — not a 100 TB run."""

from __future__ import annotations

import pytest

from medallion_data_pipeline_spark.queries import REGISTRY, _load

_load()
SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return REGISTRY[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_product_anywhere(spark):
    """Every query in the inventory must plan without CartesianProduct.
    (knn_cosine_bruteforce intentionally broadcasts the bounded query
    side — BroadcastNestedLoopJoin — which is the allowed exact-ANN
    baseline; an unbounded CartesianProduct is never allowed.)"""
    offenders = []
    for name, q in REGISTRY.items():
        plan = _plan(spark, name)
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == []


def test_supplier_performance_plan_shape(spark):
    plan = _plan(spark, "supplier_performance")
    # dims broadcast; the countDistinct rewrite must not plan an Expand
    assert "BroadcastHashJoin" in plan
    assert "Expand" not in plan


def test_pricing_summary_filter_pushdown(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]


def test_monthly_sales_broadcasts_dims(spark):
    plan = _plan(spark, "monthly_sales")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_minhash_band_join_is_equi_join(spark):
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_single_window_no_join(spark):
    plan = _plan(spark, "asof_last_click")
    assert "Join" not in plan
    assert "Window" in plan


def test_column_pruning_reaches_scan(spark):
    """orders_page projects a few columns; the parquet ReadSchema must
    not contain the unused o_comment column."""
    plan = _plan(spark, "orders_page")
    reads = [seg.split(">")[0] for seg in plan.split("ReadSchema: struct<")[1:]]
    assert reads, "no parquet scan found"
    assert all("o_comment" not in r for r in reads)
