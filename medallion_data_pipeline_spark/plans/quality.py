"""Gold data-quality check registry — the reference's 12 named count
assertions (gold/gold_builder.py:469-491, executed :497-520): each
check counts violating rows in a mart; 0 == pass. Used both as
pipeline warnings (run_quality_checks) and as pytest assertions
(tests/test_pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .gold import read_gold
from .._util import tiny_df


@dataclass
class Check:
    name: str
    table: str
    description: str
    predicate: object  # Column: TRUE == violation


def _c(name, table, desc, pred) -> Check:
    return Check(name, table, desc, pred)


def gold_checks() -> list[Check]:
    ms, ih, sp, dash = ("monthly_sales_performance", "inventory_health_metrics",
                        "supplier_performance_monthly", "supply_chain_dashboard")
    return [
        _c("no_negative_revenue", ms, "total_revenue >= 0", F.col("total_revenue") < 0),
        _c("no_future_months", ms, "sales_month not in the future",
           F.col("sales_month") > F.date_format(F.current_date(), "yyyy-MM-dd")),
        _c("consistent_calculations", ms,
           "|avg_revenue_per_unit * qty - revenue| <= 1 (reference tolerance)",
           F.abs(F.col("avg_revenue_per_unit") * F.col("total_quantity_sold")
                 - F.col("total_revenue")) > 1),
        _c("positive_order_counts", ms, "order_count > 0", F.col("order_count") <= 0),
        _c("no_negative_quantity", ih, "total_quantity >= 0", F.col("total_quantity") < 0),
        _c("capacity_not_exceeded", ih, "capacity_used_pct <= 100",
           F.col("capacity_used_pct") > 100),
        _c("no_negative_inventory_value", ih, "inventory_value >= 0",
           F.col("inventory_value") < 0),
        _c("positive_lead_times", sp, "avg_lead_time_days >= 0",
           F.col("avg_lead_time_days") < 0),
        _c("valid_on_time_rate", sp, "0 <= on_time_rate_pct <= 100",
           (F.col("on_time_rate_pct") < 0) | (F.col("on_time_rate_pct") > 100)),
        _c("fulfilled_not_above_total", sp, "fulfilled_orders <= total_orders",
           F.col("fulfilled_orders") > F.col("total_orders")),
        _c("logical_dates", dash, "delivered >= shipped where both present",
           F.col("delivery_days") < 0),
        _c("positive_quantities", dash, "quantity > 0", F.col("quantity") <= 0),
    ]


def run_quality_checks(spark: SparkSession, warehouse: str) -> DataFrame:
    """Evaluate every check; returns (check, table, violations, passed).

    All checks against one mart fold into a SINGLE aggregation pass
    (conditional sums), so each mart is scanned exactly once — 4 jobs
    for 12 checks instead of 12 filter-counts, and the only shape that
    survives a 100 TB dashboard table. The per-table jobs submit
    concurrently."""
    from collections import defaultdict
    from concurrent.futures import ThreadPoolExecutor

    by_table: dict[str, list[Check]] = defaultdict(list)
    for chk in gold_checks():
        by_table[chk.table].append(chk)

    def _check_table(item: tuple[str, list[Check]]) -> list[tuple]:
        table, checks = item
        df = read_gold(spark, warehouse, table)
        row = df.agg(*[
            F.sum(F.when(chk.predicate, 1).otherwise(0)).cast("long").alias(f"c{i}")
            for i, chk in enumerate(checks)
        ]).collect()[0]
        return [
            (chk.name, table, chk.description, row[f"c{i}"] or 0, (row[f"c{i}"] or 0) == 0)
            for i, chk in enumerate(checks)
        ]

    with ThreadPoolExecutor(max_workers=len(by_table)) as pool:
        table_rows = list(pool.map(_check_table, by_table.items()))
    rows = [r for rs in table_rows for r in rs]
    return tiny_df(
        spark, rows, "check_name string, table_name string, description string, "
                     "violations long, passed boolean")


def reconcile_silver_gold(spark: SparkSession, warehouse: str,
                          tolerance_pct: float = 5.0) -> DataFrame:
    """Cross-layer reconciliation (reference eda/supply_chain_eda.py:
    822-888): silver order totals vs the monthly sales mart, within
    tolerance. The mart filters to delivered/shipped — compare against
    the same silver subset, like the reference does."""
    from .silver import read_silver

    silver_orders = read_silver(spark, warehouse, "supply_orders").filter(
        F.col("status").isin("delivered", "shipped")
        & F.col("retail_store_id").isNotNull() & F.col("product_id").isNotNull()
    )
    gold_ms = read_gold(spark, warehouse, "monthly_sales_performance")
    s = silver_orders.agg(
        F.sum("total_invoice").alias("revenue"), F.sum("quantity").alias("units")
    ).collect()[0]
    g = gold_ms.agg(
        F.sum("total_revenue").alias("revenue"), F.sum("total_quantity_sold").alias("units")
    ).collect()[0]
    rows = []
    for measure in ("revenue", "units"):
        sv, gv = float(s[measure] or 0), float(g[measure] or 0)
        pct = 100.0 * abs(sv - gv) / max(abs(sv), 1e-9)
        rows.append((measure, sv, gv, round(pct, 4), pct <= tolerance_pct))
    return tiny_df(
        spark, rows, "measure string, silver_value double, gold_value double, "
                     "pct_diff double, passed boolean")
