"""Incremental aggregation via mergeable partial state.

The 100 TB pattern: facts arrive in batches (a day, an hour, a
partition); recomputing a full-table aggregate per batch is O(history).
Instead keep a PARTIAL-aggregate table at the group grain whose
measures are all mergeable (count, sum, min, max — and anything
derivable from them: avg = sum/count, mean/variance from moment sums),
and fold each new batch in with one small agg over (existing ∪ delta).
Cost per refresh is O(delta + groups), independent of history size.

Non-mergeable forms (countDistinct, exact percentile) must be kept as
mergeable sketches instead (HLL / t-digest — see approx_sketches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure kind -> (partial-phase expr builder, merge-phase expr builder)
_KINDS = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def partial_agg(df: DataFrame, keys: list[str],
                spec: dict[str, tuple[str, object]]) -> DataFrame:
    """Collapse raw rows to the partial-state grain.

    spec: output_col -> (kind, input expr/col name); kinds per _KINDS.
    """
    aggs = []
    for out, (kind, col) in spec.items():
        build, _ = _KINDS[kind]
        aggs.append(build(col).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(existing: DataFrame, delta: DataFrame, keys: list[str],
                   spec: dict[str, tuple[str, object]]) -> DataFrame:
    """Fold a delta partial table into the existing one: union + one
    agg with each measure's MERGE function (sum for counts/sums,
    min/max for extrema). Associative + commutative, so batches can
    arrive in any order and the result equals the from-scratch agg."""
    aggs = []
    for out, (kind, _col) in spec.items():
        _, merge = _KINDS[kind]
        aggs.append(merge(out).alias(out))
    return existing.unionByName(delta).groupBy(*keys).agg(*aggs)
