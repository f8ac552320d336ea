"""The declared query inventory — the engine's correctness surface.

Every operator class from SURVEY.md §2 (plus the LLM-data-pipeline
extensions) is exposed as a named query: a ``(spark, sf_dir) ->
DataFrame`` callable and, where SQL-expressible, a DuckDB oracle SQL
string computing the same result on the same parquet tables. The driver
(and tools/check_correctness.py locally) runs both sides and compares
row count + schema + order-insensitive value hash.

Determinism contract (both sides MUST follow it, or the value hash
diverges on floating-point summation order):

- money/measure sums: cast to DECIMAL(18,2) *before* SUM (exact,
  order-independent), cast the total to DOUBLE after;
- averages/ratios: exact decimal sums cast to double, divided in
  double (IEEE ops on identical inputs are identical), then round();
- never output DECIMAL columns (engines render scale differently) —
  final numeric columns are DOUBLE or integer types;
- hashing for dedup/fingerprints uses md5 (portable hex), never
  engine-specific hash functions;
- every query with LIMIT has a total-order ORDER BY (unique tiebreak).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, bench: bool = False):
    def deco(fn):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle,
                               doc=(fn.__doc__ or "").strip(), bench=bench)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_loaded = False


def _load():
    global _loaded
    if _loaded:
        return
    from . import analytics, cleaning_suite, core, events_q, llmops  # noqa: F401
    _loaded = True
