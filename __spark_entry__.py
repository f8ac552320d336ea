"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the monthly-sales mart — the
reference's primary gold output, gold_builder.py:89-123) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full declared inventory
from ``medallion_data_pipeline_spark.queries`` (one entry per operator
class in SURVEY.md §2 plus the LLM-data-pipeline extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from medallion_data_pipeline_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.queries()["monthly_sales"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
