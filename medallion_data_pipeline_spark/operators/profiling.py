"""Reusable EDA/profiling operators (SURVEY §2.4 A8-A13) — the
DataFrame-utility form of the reference's eda/supply_chain_eda.py.
The oracle-checked query versions live in queries/analytics.py; these
generic helpers work on any DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .._util import tiny_df


def null_profile(df: DataFrame) -> DataFrame:
    """Per-column null counts + percentages (reference
    eda/supply_chain_eda.py:141-152), single pass."""
    n = F.count(F.lit(1))
    aggs = [n.alias("_n_rows")]
    for c in df.columns:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(c))
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in df.columns)
    return wide.selectExpr(
        "_n_rows as n_rows",
        f"stack({len(df.columns)}, {stack_expr}) as (column, n_nulls)",
    ).select(
        "column",
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows") * 100.0, 4).alias("pct_nulls"),
    )


def duplicate_count(df: DataFrame, subset: list[str] | None = None) -> int:
    """Full-row (or keyed) duplicate count (reference
    eda/supply_chain_eda.py:167-184)."""
    cols = subset or df.columns
    return df.count() - df.dropDuplicates(cols).count()


def describe_plus(df: DataFrame, col: str) -> DataFrame:
    """describe + quartiles + distinct count for one numeric column
    (reference eda/supply_chain_eda.py:689-710).

    The three exact quartiles come from ONE ``percentile(c, array(...))``
    aggregate (each scalar ``percentile`` call is an independent
    imperative aggregate with its own full value-count buffer: 4.3 s
    vs 1.8 s at sf0.1), and the distinct count runs in its OWN agg,
    cross-joined back: ``countDistinct`` alongside other aggregates
    plans an Expand that doubles every input row through the
    percentile buffers. Identical values either way."""
    c = F.col(col)
    q = F.percentile(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return df.agg(
        F.count(c).alias("count"),
        F.round(F.avg(c), 6).alias("mean"),
        F.round(F.stddev(c), 6).alias("stddev"),
        F.min(c).alias("min"),
        q.alias("_q"),
        F.max(c).alias("max"),
        F.round(F.skewness(c), 6).alias("skewness"),
        F.round(F.kurtosis(c), 6).alias("kurtosis"),
    ).crossJoin(
        df.agg(F.countDistinct(c).alias("n_distinct"))
    ).select(
        "count", "mean", "stddev", "min",
        F.col("_q")[0].alias("q25"),
        F.col("_q")[1].alias("median"),
        F.col("_q")[2].alias("q75"),
        "max", "n_distinct", "skewness", "kurtosis",
    )


def value_counts(df: DataFrame, col: str, top: int = 10) -> DataFrame:
    """Top-N frequency table (reference eda/supply_chain_eda.py:378-399)."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc(col))
        .limit(top)
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations, ranked by |r| (reference
    eda/supply_chain_eda.py:604-635). One agg computes all pairs."""
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.corr(a, b).alias(f"{a}|{b}"))
    wide = df.agg(*aggs)
    pairs = [f"'{name}', `{name}`" for name in [f"{a}|{b}" for i, a in enumerate(cols) for b in cols[i + 1:]]]
    return (
        wide.selectExpr(f"stack({len(pairs)}, {', '.join(pairs)}) as (pair, pearson_r)")
        .withColumn("pearson_r", F.round("pearson_r", 6))
        .orderBy(F.desc(F.abs(F.col("pearson_r"))))
    )


def reconcile(a: DataFrame, b: DataFrame, measures: dict[str, str],
              tolerance_pct: float = 5.0) -> DataFrame:
    """Cross-layer reconciliation (reference eda/supply_chain_eda.py:
    822-888): compare aggregate measures of two frames with a %
    tolerance; returns one row per measure with pass/fail."""
    rows = []
    for name, expr in measures.items():
        va = a.selectExpr(f"{expr} as v").collect()[0].v
        vb = b.selectExpr(f"{expr} as v").collect()[0].v
        diff = abs((va or 0) - (vb or 0))
        base = max(abs(va or 0), 1e-12)
        pct = 100.0 * diff / base
        rows.append((name, float(va or 0), float(vb or 0), round(pct, 6), pct <= tolerance_pct))
    spark = a.sparkSession
    return tiny_df(
        spark, rows,
        "measure string, value_a double, value_b double, pct_diff double, passed boolean",
    )
