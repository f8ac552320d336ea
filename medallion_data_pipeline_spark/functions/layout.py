"""Multi-dimensional data-clustering keys for scan-pruning layouts.

At 100 TB the cheapest query is the one that never reads the bytes:
parquet scans skip whole files/row-groups whose column min/max stats
don't overlap the predicate. A LINEAR sort clusters one column only —
filters on a second column read everything. Z-ordering (bit-interleave
of rank-normalized dimensions — the technique behind Delta Lake's
``OPTIMIZE ZORDER BY`` and ClickHouse/Iceberg multi-dim clustering)
keeps every interleaved dimension's values locally bounded in every
file, so min/max pruning works for ALL of them at once.

Everything here is exact integer arithmetic (subtract-scale-interleave)
so the DuckDB oracle replays it bit-for-bit; no UDFs, whole-stage
codegen throughout.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default bits per dimension (2 dims -> 20-bit z values)
ZORDER_BITS = 10


def normalize_dim(col: Column, vmin: Column | int, vmax: Column | int,
                  bits: int = ZORDER_BITS) -> Column:
    """Map an integer column into [0, 2**bits) preserving order:
    ``(v - vmin) * 2**bits div (vmax - vmin + 1)``, clamped into range.

    Exactness: the division is Spark's IntegralDivide (the SQL ``div``
    operator), NOT ``floor(a / b)`` — ``/`` is double division and for
    spans >= ~2**48 the float64 quotient can round UP across an integer
    boundary (e.g. span=2**48+5, v=56349970923521: floor-of-double says
    205, exact div says 204), silently breaking the bit-for-bit oracle
    replay. Precondition: ``(vmax - vmin + 1) * 2**bits`` must fit in
    int64 — pre-scale huge domains (e.g. truncate ns timestamps to
    seconds) before clustering; asserted when the bounds are literals.

    Robustness: values outside the caller-supplied ``[vmin, vmax]``
    (stale catalog stats at scale) are clamped to the edge buckets
    instead of corrupting the key — an un-clamped ``v < vmin`` turns
    every z-bit on via sign propagation, and ``v > vmax`` bleeds into
    other dimensions' bit positions."""
    if isinstance(vmin, int) and isinstance(vmax, int):
        assert (vmax - vmin + 1) << bits < (1 << 63), (
            "span * 2**bits overflows int64; pre-scale the column")
    vmin = F.lit(vmin) if isinstance(vmin, int) else vmin
    vmax = F.lit(vmax) if isinstance(vmax, int) else vmax
    span = vmax.cast("long") - vmin.cast("long") + F.lit(1)
    scaled = (col.cast("long") - vmin.cast("long")) * F.lit(1 << bits)
    # exact integral division (IntegralDivide), then clamp into range
    dim = F.call_function("div", scaled, span)
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit((1 << bits) - 1).cast("long"), dim))


def interleave_bits(dims: list[Column], bits: int = ZORDER_BITS) -> Column:
    """The z-value: bit i of dimension d lands at position
    ``i * len(dims) + d``. Pure shift/mask/sum — codegen'd, no UDF,
    and replayable in any engine with ``&``, ``<<``, ``>>``."""
    n = len(dims)
    if n * bits > 63:
        raise ValueError(
            f"{n} dims x {bits} bits = {n * bits} z-bits shifts into the "
            "long sign bit; lower bits so len(dims) * bits <= 63")
    terms = []
    for d, col in enumerate(dims):
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * n + d))
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_key(dims: list[tuple[Column, Column | int, Column | int]],
               bits: int = ZORDER_BITS) -> Column:
    """Z-order key over ``[(col, vmin, vmax), ...]``: normalize each
    dimension to ``bits`` bits, then interleave. Sorting/partitioning
    by this key is the write-side clustering step; the read side needs
    nothing — parquet min/max pruning just starts working for every
    interleaved column."""
    return interleave_bits(
        [normalize_dim(c, lo, hi, bits) for c, lo, hi in dims], bits)


def zorder_sql(cols: list[tuple[str, str, str]],
               bits: int = ZORDER_BITS) -> str:
    """The DuckDB replay of :func:`zorder_key` —
    ``cols = [(col_expr, min_expr, max_expr), ...]`` as SQL strings.
    Kept next to the Spark form so the two can never drift apart:
    same clamp, same ``len * bits <= 63`` guard. DuckDB's ``//``
    floors where Spark's ``div`` truncates toward zero, but the two
    only disagree on negative quotients, which the shared clamp maps
    to 0 on both sides."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"{n} dims x {bits} bits = {n * bits} z-bits shifts into the "
            "long sign bit; lower bits so len(dims) * bits <= 63")
    dims = [
        f"GREATEST(0, LEAST({(1 << bits) - 1},"
        f" (({c} - {lo}) * {1 << bits}) // ({hi} - {lo} + 1)))"
        for c, lo, hi in cols
    ]
    terms = []
    for d, dim in enumerate(dims):
        for i in range(bits):
            # each term fully parenthesized: DuckDB/Postgres give `+`
            # TIGHTER precedence than `<<`, so a bare `a << 3 + b`
            # parses as `a << (3 + b)`
            terms.append(f"(((({dim}) >> {i}) & 1) << {i * n + d})")
    return "(" + " + ".join(terms) + ")"
