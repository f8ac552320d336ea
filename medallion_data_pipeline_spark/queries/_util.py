"""Shared helpers for the query inventory — both Spark-side column
builders and DuckDB-side SQL snippet builders, so each query's two
implementations follow the determinism contract (queries/__init__.py)
by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .._util import spread
from ..sources.testdata import load_table

MONEY = "decimal(18,2)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def td(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table, SPREAD to full input parallelism — for any
    query that chains per-row tokenize/shingle/hash work onto the
    scan. The driver testdata is one parquet row group per table (=
    one scan task), so an unspread corpus-wide tokenize serializes
    onto a single core: contamination_check measured 4.9 s at sf0.1
    but 3.6 s on the 10x-bigger 32-file sf1 layout purely because the
    latter scan parallelizes (docs/SCALING.md). At 100 TB inputs
    arrive as many files and spread() is a no-op (see _util.spread)."""
    return spread(load_table(spark, sf_dir, "documents"))


def dmoney(c: Column | str) -> Column:
    """Exact money: cast a double measure to DECIMAL(18,2) pre-aggregation."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(MONEY)


def dsum(c: Column | str) -> Column:
    """Order-independent exact sum of a 2-dp measure, surfaced as DOUBLE."""
    return F.sum(dmoney(c)).cast("double")


def fdiv(num: Column, den: Column, scale: int = 6) -> Column:
    """Guarded division rounded to ``scale`` — NULL when the denominator
    is 0 (the reference's NULLIF pattern, gold_builder.py:118)."""
    return F.round(F.when(den != 0, num.cast("double") / den.cast("double")), scale)


# --- SQL (DuckDB oracle) snippet builders -------------------------------

def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_fdiv(num: str, den: str, scale: int = 6) -> str:
    return f"ROUND(CASE WHEN {den} <> 0 THEN CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) END, {scale})"


def sql_initcap(expr: str) -> str:
    """DuckDB has no initcap; emulate Spark's (split on single spaces,
    upper first char, lower the rest). Callers must have collapsed
    whitespace first — Spark initcap treats any whitespace run as a
    separator, this emulation assumes single spaces."""
    return ("array_to_string(list_transform(string_split(" + expr + ", ' '), "
            "w -> upper(w[1:1]) || lower(w[2:])), ' ')")
