"""Core relational queries — the engine's spine.

Each query re-expresses an operator row from SURVEY.md §2 (ids cited
per query) over the driver testdata star schema. Spark side is
DataFrame API (Catalyst plans it); oracle side is the equivalent ANSI
SQL for DuckDB. Both follow the determinism contract in
queries/__init__.py.

Scale notes are attached per query: which side broadcasts, where the
shuffle lands, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import register
from ._util import dmoney, dsum, fdiv, sql_dsum, sql_fdiv, t

# ---------------------------------------------------------------------------
# q01 — pricing summary (SURVEY A1-analog: multi-agg hash aggregation with
# derived measures; the TPC-H Q1 shape). Scale: map-side partial agg on 6
# grouping values -> single tiny shuffle; scan prunes to 7 columns.
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)        AS sum_qty,
       {rev}                                                          AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)  AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1.0 - l_discount AS DECIMAL(4,2))
                * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE)       AS sum_charge,
       {avg_qty}                                                      AS avg_qty,
       {avg_price}                                                    AS avg_price,
       {avg_disc}                                                     AS avg_disc,
       COUNT(*)                                                       AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""".format(
        rev=sql_dsum("l_extendedprice"),
        avg_qty=sql_fdiv("SUM(CAST(l_quantity AS DECIMAL(18,2)))", "COUNT(*)"),
        avg_price=sql_fdiv("SUM(CAST(l_extendedprice AS DECIMAL(18,2)))", "COUNT(*)"),
        avg_disc=sql_fdiv("SUM(CAST(l_discount AS DECIMAL(4,2)))", "COUNT(*)"),
    ),
    bench=True,
)
def pricing_summary(spark, sf_dir):
    """Hash aggregation with 8 aggregates + derived averages (SURVEY A1,
    A2, F13; filter P8 pushed to the parquet scan)."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") <= F.lit("2001-09-02").cast("date")
    )
    disc_factor = (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")
    tax_factor = (F.lit(1.0) + F.col("l_tax")).cast("decimal(4,2)")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dmoney("l_quantity")).cast("double").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(dmoney("l_extendedprice") * disc_factor).cast("double").alias("sum_disc_price"),
            F.sum(dmoney("l_extendedprice") * disc_factor * tax_factor).cast("double").alias("sum_charge"),
            fdiv(F.sum(dmoney("l_quantity")), n).alias("avg_qty"),
            fdiv(F.sum(dmoney("l_extendedprice")), n).alias("avg_price"),
            fdiv(F.sum(F.col("l_discount").cast("decimal(4,2)")), n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — monthly sales mart (SURVEY A1/A2, J1, F12-F14): the reference's
# monthly_sales_performance (gold_builder.py:89-123) re-keyed to the
# testdata star. Scale: fact shuffles once on the group keys; all three
# dims broadcast (nation 25 rows, region 5, customer bounded) — at 100 TB
# customer would be a shuffle join, so it joins FIRST while nation/region
# stay broadcast.
# ---------------------------------------------------------------------------

_MONTHLY_SALES_SQL = """
WITH enriched AS (
    SELECT o.*, r.r_name AS region
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
)
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS sales_month,
       region,
       COUNT(DISTINCT o_orderkey)                     AS order_count,
       {rev}                                          AS total_revenue,
       {aov}                                          AS avg_order_value,
       COUNT(DISTINCT o_custkey)                      AS unique_customers,
       {rpc}                                          AS revenue_per_customer
FROM enriched
GROUP BY 1, 2
""".format(
    rev=sql_dsum("o_totalprice"),
    aov=sql_fdiv("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", "COUNT(DISTINCT o_orderkey)"),
    rpc=sql_fdiv("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", "COUNT(DISTINCT o_custkey)"),
)


@register("monthly_sales", oracle=_MONTHLY_SALES_SQL, bench=True)
def monthly_sales(spark, sf_dir):
    """Monthly sales mart: 3-dim star join + month rollup with distinct
    counts and guarded ratios (reference gold_builder.py:89-123)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = t(spark, sf_dir, "region")
    enriched = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    agg = (
        enriched.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("sales_month"),
            F.col("r_name").alias("region"),
        )
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            F.sum(dmoney("o_totalprice")).alias("_rev"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
    )
    return agg.select(
        "sales_month",
        "region",
        "order_count",
        F.col("_rev").cast("double").alias("total_revenue"),
        fdiv(F.col("_rev"), F.col("order_count")).alias("avg_order_value"),
        "unique_customers",
        fdiv(F.col("_rev"), F.col("unique_customers")).alias("revenue_per_customer"),
    )


# ---------------------------------------------------------------------------
# q03 — supplier monthly scorecard (SURVEY A4, J3, F15): conditional
# aggregates + date arithmetic + distinct-count. Scale: lineitem⋈orders is
# the one fact-fact shuffle (co-partition on orderkey); COUNT(DISTINCT
# orderkey) is rewritten as a two-phase aggregation (collapse to
# (suppkey, orderkey) grain, then count rows) so Catalyst never plans an
# Expand, and both shuffles carry integer keys — supplier/nation names are
# broadcast-joined AFTER the final aggregation at supplier-month grain.
# ---------------------------------------------------------------------------

_SUPPLIER_PERF_SQL = """
SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m-%d') AS order_month,
       s.s_name                                          AS supplier,
       n.n_name                                          AS supplier_nation,
       COUNT(DISTINCT l.l_orderkey)                      AS n_orders,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_units,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       {delay}                                           AS avg_ship_delay_days,
       {ontime}                                          AS on_time_rate,
       {ret}                                             AS return_rate
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2, 3
""".format(
    delay=sql_fdiv(
        "SUM(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)))",
        "COUNT(*)",
    ),
    ontime=sql_fdiv(
        "SUM(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) <= 90 THEN 1 ELSE 0 END)",
        "COUNT(*)",
    ),
    ret=sql_fdiv("SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)", "COUNT(*)"),
)


@register("supplier_performance", oracle=_SUPPLIER_PERF_SQL, bench=True)
def supplier_performance(spark, sf_dir):
    """Supplier monthly scorecard: fact-fact join + conditional sums +
    avg lead time + distinct order count (reference gold_builder.py:196-228).

    COUNT(DISTINCT l_orderkey) per (month, supplier) is expressed as a
    two-phase aggregation: phase 1 collapses line items to (suppkey,
    orderkey, month) grain with partial sums; phase 2 counts those rows
    and totals the partials. Same result as countDistinct, but no Expand
    doubling the map-side rows, and the shuffle rows are all-numeric —
    supplier/nation name columns join (broadcast) after the final agg,
    so they never ride through a shuffle. ~25% faster at sf0.1 and the
    shape that survives 100 TB."""
    li = t(spark, sf_dir, "lineitem")
    # month is computed on the 150K-row orders side pre-join (not per
    # joined line item) and kept as an 8-byte timestamp through both
    # aggregation phases; the display string is formatted only on the
    # final ~supplier x month rows. Grouping 600K rows by a formatted
    # string key measured +1.3s at sf0.1 vs the timestamp key.
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate",
        F.date_trunc("month", "o_orderdate").alias("_month_ts"),
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    delay = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_suppkey",
            "l_orderkey",  # _month_ts is functionally dependent on the key
            "_month_ts",
        )
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dmoney("l_quantity")).alias("_units"),
            F.sum(dmoney("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)"))
            .alias("_rev"),
            F.sum(delay).alias("_delay"),
            F.sum(F.when(delay <= 90, 1).otherwise(0)).alias("_ontime"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("_ret"),
        )
    )
    cnt = F.sum("_n")
    agg = (
        per_order.groupBy("_month_ts", "l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("_units").cast("double").alias("total_units"),
            F.sum("_rev").cast("double").alias("revenue"),
            fdiv(F.sum("_delay"), cnt).alias("avg_ship_delay_days"),
            fdiv(F.sum("_ontime"), cnt).alias("on_time_rate"),
            fdiv(F.sum("_ret"), cnt).alias("return_rate"),
        )
    )
    return (
        agg.join(F.broadcast(s), agg.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.date_format("_month_ts", "yyyy-MM-dd").alias("order_month"),
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("supplier_nation"),
            "n_orders", "total_units", "revenue",
            "avg_ship_delay_days", "on_time_rate", "return_rate",
        )
    )


# ---------------------------------------------------------------------------
# q04 — wide dashboard (SURVEY J4, F11, F17, F18): left-outer star with
# COALESCE('Unknown') dim fill, CASE tiering, boolean DQ flags — the
# reference's 53-col supply_chain_dashboard shape (gold_builder.py:277-411)
# at line-item grain. Scale: left joins keep fact cardinality; dims
# broadcast; no shuffle beyond the fact⋈orders co-partition.
# ---------------------------------------------------------------------------

_DASHBOARD_SQL = """
SELECT l.l_orderkey, l.l_linenumber,
       COALESCE(p.p_name, 'Unknown')   AS part_name,
       COALESCE(s.s_name, 'Unknown')   AS supplier_name,
       COALESCE(o.o_orderpriority, 'Unknown') AS order_priority,
       CAST(l.l_extendedprice AS DOUBLE) AS extended_price,
       CASE WHEN l.l_extendedprice >= 50000 THEN 'High'
            WHEN l.l_extendedprice >= 10000 THEN 'Medium'
            ELSE 'Low' END              AS value_tier,
       CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) <= 30 THEN 'Excellent'
            WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) <= 90 THEN 'Good'
            WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) <= 180 THEN 'Fair'
            ELSE 'Poor' END             AS ship_speed_tier,
       (l.l_returnflag = 'R')           AS is_returned,
       (p.p_partkey IS NULL OR s.s_suppkey IS NULL OR o.o_orderkey IS NULL) AS dq_missing_dim,
       (l.l_extendedprice < 0 OR l.l_quantity <= 0) AS dq_bad_amount
FROM lineitem l
LEFT JOIN part p     ON l.l_partkey = p.p_partkey
LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
LEFT JOIN orders o   ON l.l_orderkey = o.o_orderkey
"""


@register("dashboard_wide", oracle=_DASHBOARD_SQL, bench=True)
def dashboard_wide(spark, sf_dir):
    """Wide analytics row: 3-way left-outer star + Unknown-fill + CASE
    buckets + DQ flag columns (reference gold_builder.py:277-411)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    ship_days = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "left")
        .join(o, li.l_orderkey == o.o_orderkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.coalesce("p_name", F.lit("Unknown")).alias("part_name"),
            F.coalesce("s_name", F.lit("Unknown")).alias("supplier_name"),
            F.coalesce("o_orderpriority", F.lit("Unknown")).alias("order_priority"),
            F.col("l_extendedprice").cast("double").alias("extended_price"),
            F.when(F.col("l_extendedprice") >= 50000, "High")
            .when(F.col("l_extendedprice") >= 10000, "Medium")
            .otherwise("Low").alias("value_tier"),
            F.when(ship_days <= 30, "Excellent")
            .when(ship_days <= 90, "Good")
            .when(ship_days <= 180, "Fair")
            .otherwise("Poor").alias("ship_speed_tier"),
            (F.col("l_returnflag") == "R").alias("is_returned"),
            (F.col("p_partkey").isNull() | F.col("s_suppkey").isNull() | F.col("o_orderkey").isNull())
            .alias("dq_missing_dim"),
            ((F.col("l_extendedprice") < 0) | (F.col("l_quantity") <= 0)).alias("dq_bad_amount"),
        )
    )


# ---------------------------------------------------------------------------
# q05 — top-k per group (SURVEY W3/O1): row_number window, k=5 customers
# per region by revenue. Scale: one shuffle on the window partition key;
# revenue pre-agg shrinks input before the window.
# ---------------------------------------------------------------------------

_TOP_CUSTOMERS_SQL = """
WITH rev AS (
    SELECT c.c_custkey, c.c_name, r.r_name AS region,
           {rev} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2, 3
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY region ORDER BY revenue DESC, c_custkey) AS rnk
    FROM rev
)
SELECT region, rnk, c_custkey, c_name, revenue
FROM ranked WHERE rnk <= 5
""".format(rev=sql_dsum("o.o_totalprice"))


@register("top_customers_per_region", oracle=_TOP_CUSTOMERS_SQL)
def top_customers_per_region(spark, sf_dir):
    """Per-group top-k via row_number window (SURVEY W3: the reference's
    nlargest pattern, eda/supply_chain_eda.py:465)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = t(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("c_custkey", "c_name", F.col("r_name").alias("region"))
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = W.partitionBy("region").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("region", "rnk", "c_custkey", "c_name", "revenue")
    )


# ---------------------------------------------------------------------------
# q06 — union / reconciliation (SURVEY A12 + set ops §2.6): revenue per
# year measured from two layers, unioned with a source tag — the
# reference's silver-vs-gold reconciliation shape.
# ---------------------------------------------------------------------------

_RECONCILE_SQL = """
SELECT CAST(year(l_shipdate) AS INT) AS yr, 'lineitem' AS source,
       {lrev} AS revenue
FROM lineitem GROUP BY 1
UNION ALL
SELECT CAST(year(o_orderdate) AS INT) AS yr, 'orders' AS source,
       {orev} AS revenue
FROM orders GROUP BY 1
""".format(lrev=sql_dsum("l_extendedprice"), orev=sql_dsum("o_totalprice"))


@register("reconcile_layers", oracle=_RECONCILE_SQL)
def reconcile_layers(spark, sf_dir):
    """UNION ALL of per-year revenue from two tables (SURVEY A12
    cross-layer reconciliation + the pd.concat union, §2.6)."""
    li = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.year("l_shipdate").cast("int").alias("yr"))
        .agg(dsum("l_extendedprice").alias("revenue"))
        .select("yr", F.lit("lineitem").alias("source"), "revenue")
    )
    o = (
        t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(dsum("o_totalprice").alias("revenue"))
        .select("yr", F.lit("orders").alias("source"), "revenue")
    )
    return li.unionByName(o)


# ---------------------------------------------------------------------------
# q07 — anti/semi join (SURVEY J-row "not present" -> engine extension;
# the rejection-split P7 is the reference's implicit anti-join).
# ---------------------------------------------------------------------------

_CUSTOMER_ACTIVITY_SQL = """
SELECT n.n_name AS nation,
       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                THEN 1 ELSE 0 END) AS BIGINT) AS active_customers,
       CAST(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                THEN 1 ELSE 0 END) AS BIGINT) AS inactive_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""


@register("customer_activity", oracle=_CUSTOMER_ACTIVITY_SQL)
def customer_activity(spark, sf_dir):
    """left_semi / left_anti joins: customers with vs without orders per
    nation (SURVEY §2.3 — anti-join as rejection-split analogue)."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    active = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.col("c_nationkey").alias("nk_active"))
        .agg(F.count(F.lit(1)).alias("active_customers"))
    )
    inactive = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nk_inactive"))
        .agg(F.count(F.lit(1)).alias("inactive_customers"))
    )
    return (
        F.broadcast(n)
        .join(active, n.n_nationkey == active.nk_active, "left")
        .join(inactive, n.n_nationkey == inactive.nk_inactive, "left")
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce("active_customers", F.lit(0)).alias("active_customers"),
            F.coalesce("inactive_customers", F.lit(0)).alias("inactive_customers"),
        )
    )


# ---------------------------------------------------------------------------
# q08 — rollup (SURVEY A15: "not present" in reference, free in Spark):
# region/nation hierarchy with subtotals + grand total.
# ---------------------------------------------------------------------------

_ROLLUP_SQL = """
SELECT COALESCE(r.r_name, 'ALL') AS region,
       COALESCE(n.n_name, 'ALL') AS nation,
       COUNT(*)                  AS n_customers,
       {bal}                     AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""".format(bal=sql_dsum("c.c_acctbal"))


@register("rollup_customer_balance", oracle=_ROLLUP_SQL)
def rollup_customer_balance(spark, sf_dir):
    """ROLLUP grouping-sets aggregation over the region->nation
    hierarchy (SURVEY A15 extension)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region")
    j = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("total_acctbal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_acctbal",
        )
    )


# ---------------------------------------------------------------------------
# q09 — sort + limit/offset pagination (SURVEY O1-O3).
# ---------------------------------------------------------------------------

_PAGINATION_SQL = """
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS total_price, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 10
"""


@register("orders_page", oracle=_PAGINATION_SQL)
def orders_page(spark, sf_dir):
    """Global sort + LIMIT/OFFSET pagination (SURVEY O1/O3, the
    Streamlit Database-Explorer pattern app.py:1279-1282). Total order
    via unique tiebreak key so pages are deterministic."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("total_price"),
            "o_orderpriority",
        )
        .offset(10)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q — cast-key join (SURVEY J5: the reference joins int store ids to a
# TEXT fact key, bronze/database_setup.py:251).
# ---------------------------------------------------------------------------

_CAST_KEY_JOIN_SQL = """
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e
JOIN customer c ON CAST(e.user_id AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)
GROUP BY 1
"""


@register("cast_key_join", oracle=_CAST_KEY_JOIN_SQL)
def cast_key_join(spark, sf_dir):
    """Equi-join on type-cast keys (SURVEY J5: int dim key = TEXT fact
    key). Catalyst still plans a hash join on the casted expression."""
    e = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        e.join(F.broadcast(c),
               e.user_id.cast("string") == c.c_custkey.cast("string"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# q — pivot (SURVEY §2.6 extension; guide 'pivot/unpivot').
# ---------------------------------------------------------------------------

_PIVOT_SQL = """
SELECT r.r_name AS region,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY 1
"""


@register("pivot_status_by_region", oracle=_PIVOT_SQL)
def pivot_status_by_region(spark, sf_dir):
    """Pivot: order-status columns per region (pivot with an explicit
    value list compiles to conditional aggregation — no extra pass)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = t(spark, sf_dir, "region")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.groupBy(F.col("r_name").alias("region"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "region",
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


# ---------------------------------------------------------------------------
# q — cube (SURVEY A15 extension).
# ---------------------------------------------------------------------------

_CUBE_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL')  AS status,
       COUNT(*) AS n_orders,
       {rev} AS total_revenue
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""".format(rev=sql_dsum("o_totalprice"))


@register("cube_priority_status", oracle=_CUBE_SQL)
def cube_priority_status(spark, sf_dir):
    """CUBE grouping sets over priority x status (SURVEY A15: absent in
    the reference, free in Spark)."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_revenue"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_revenue",
        )
    )


# ---------------------------------------------------------------------------
# q — INTERSECT / EXCEPT set operations (SURVEY §2.6: absent in the
# reference; completes the set-op family beside UNION ALL).
# ---------------------------------------------------------------------------

_SET_OPS_SQL = """
WITH both_years AS (
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
), churned AS (
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
)
SELECT 'retained' AS cohort, COUNT(*) AS n_customers FROM both_years
UNION ALL
SELECT 'churned' AS cohort, COUNT(*) AS n_customers FROM churned
"""


@register("customer_cohort_set_ops", oracle=_SET_OPS_SQL)
def customer_cohort_set_ops(spark, sf_dir):
    """INTERSECT/EXCEPT cohort analysis: customers active in both 1996
    and 1997 vs churned after 1996."""
    o = t(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    retained = y96.intersect(y97).agg(F.count(F.lit(1)).alias("n_customers")) \
        .select(F.lit("retained").alias("cohort"), "n_customers")
    # subtract == SQL EXCEPT (set semantics); exceptAll would be the bag
    # difference and keep customers who merely ordered MORE in 1996
    churned = y96.subtract(y97).agg(F.count(F.lit(1)).alias("n_customers")) \
        .select(F.lit("churned").alias("cohort"), "n_customers")
    return retained.unionByName(churned)


# ---------------------------------------------------------------------------
# q — mode (most frequent value) via deterministic top-1 (SURVEY A8's
# pandas mode, made order-stable with a value tiebreak).
# ---------------------------------------------------------------------------

_MODE_SQL = """
WITH counts AS (
    SELECT o_orderpriority AS value, COUNT(*) AS n
    FROM orders GROUP BY 1
)
SELECT value AS mode_priority, n AS n_occurrences
FROM counts ORDER BY n DESC, value LIMIT 1
"""


@register("mode_order_priority", oracle=_MODE_SQL)
def mode_order_priority(spark, sf_dir):
    """Mode statistic: groupBy-count + total-order top-1 (ties broken by
    value, so both engines agree)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
        .limit(1)
        .select(F.col("value").alias("mode_priority"), F.col("n").alias("n_occurrences"))
    )


# ---------------------------------------------------------------------------
# TPC-H classic shapes (adapted to the driver testdata's columns):
# Q3 shipping priority, Q5 local-supplier volume (the customer-nation
# == supplier-nation join predicate), Q12 ship-mode severity buckets.
# ---------------------------------------------------------------------------

_Q3_SQL = """
SELECT l.l_orderkey AS orderkey,
       {rev} AS revenue,
       strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
       o.o_orderpriority AS priority
FROM customer c
JOIN orders o  ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
  AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
""".format(rev="CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)")


@register("q3_shipping_priority", oracle=_Q3_SQL)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 (adapted: this testdata carries o_orderpriority, not
    o_shippriority): unshipped high-value BUILDING orders. Date filters
    push to both scans; customer filter semi-reduces orders before the
    lineitem join; total-order top-10 (revenue DESC, orderkey ASC)."""
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < "1995-03-15").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > "1995-03-15").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    rev = F.sum(dmoney("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
            .alias("orderdate"),
            F.col("o_orderpriority").alias("priority"))
        .agg(rev.cast("double").alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "priority")
        .orderBy(F.desc("revenue"), F.asc("orderkey")).limit(10)
    )


_Q5_SQL = """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND CAST(o.o_orderdate AS DATE) >= DATE '1995-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1996-01-01'
GROUP BY n.n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_SQL)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: revenue from orders where the SUPPLIER IS IN THE
    CUSTOMER'S NATION (the c_nationkey = s_nationkey predicate rides
    the lineitem-supplier join) for ASIA, 1995. nation/region broadcast
    and prune suppliers before any fact shuffle."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= "1995-01-01")
        & (F.col("o_orderdate").cast("date") < "1996-01-01")).select(
        "o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = (t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
         .join(F.broadcast(n.join(F.broadcast(r),
                                  n.n_regionkey == r.r_regionkey)
                           .select("n_nationkey", "n_name")),
               F.col("s_nationkey") == F.col("n_nationkey")))
    rev = F.sum(dmoney("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(rev.cast("double").alias("revenue"))
    )


_Q12_SQL = """
SELECT l.l_linestatus AS linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
                CAST(l.l_shipdate AS DATE)) > 60
GROUP BY l.l_linestatus
"""


@register("q12_late_lines_priority", oracle=_Q12_SQL)
def q12_late_lines_priority(spark, sf_dir):
    """TPC-H Q12 (adapted: this testdata has no shipmode/commit/
    receipt columns): lines shipped >60 days after their order date,
    bucketed by line status into high/low priority counts — same
    fact-fact join + CASE-bucket shape as the original; the delay
    predicate is cross-table so it applies post-join."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate")
    late = F.datediff(F.col("l_shipdate").cast("date"),
                      F.col("o_orderdate").cast("date")) > 60
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(F.sum(hi.cast("int")).alias("high_line_count"),
             F.sum((~hi).cast("int")).alias("low_line_count"))
    )
