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
        # a real raise, not assert: python -O must not strip the guard
        # against silent int64 wraparound (ANSI off on the JVM side)
        if (vmax - vmin + 1) << bits >= (1 << 63):
            raise ValueError(
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


def _hilbert_tables() -> tuple[int, int]:
    """Derive the 2-D Hilbert state machine and pack it into two 32-bit
    ints (2 bits per entry, idx = st*4 + bx*2 + by).

    A Hilbert walk is the z-order walk with the diagonal jumps removed:
    consecutive keys are always Manhattan-adjacent cells (pinned in
    tests over full grids), so a key-range slice of a Hilbert-sorted
    file maps to a tighter bounding box than the same slice of a
    z-sorted file. The classic xy2d algorithm mutates (x, y) per level
    (reflect + swap); composing those rotations gives exactly 4 states
    — (swap s, complement c) — so the whole walk becomes one 4-state
    machine over the ORIGINAL bit pairs, i.e. pure shift/mask
    arithmetic that whole-stage codegen compiles and any SQL engine
    replays (same style as :func:`zorder_sql`)."""
    D = S = 0
    for st in range(4):
        s, c = st >> 1, st & 1
        for bx in range(2):
            for by in range(2):
                rx = c ^ (by if s else bx)          # bit seen after state
                ry = c ^ (bx if s else by)
                digit = (3 * rx) ^ ry               # quadrant on the walk
                s2 = s ^ (1 if ry == 0 else 0)      # compose the rotation
                c2 = c ^ (1 if ry == 0 and rx == 1 else 0)
                idx = st * 4 + bx * 2 + by
                D |= digit << (2 * idx)
                S |= (s2 * 2 + c2) << (2 * idx)
    return D, S


#: packed digit/state-transition tables (values 916201140 / 1336203570)
_HILBERT_D, _HILBERT_S = _hilbert_tables()


def hilbert_key(dims: list[tuple[Column, Column | int, Column | int]],
                bits: int = ZORDER_BITS) -> Column:
    """Hilbert-curve key over exactly two ``(col, vmin, vmax)`` dims:
    normalize each to ``bits`` bits (:func:`normalize_dim` — exact,
    clamped), then walk the 4-state machine top bit first. Expression
    depth is linear in ``bits`` (each level's index feeds the next
    state exactly once), so the single returned Column stays small."""
    if len(dims) != 2:
        raise ValueError("hilbert_key is 2-D; pass exactly two dims")
    if 2 * bits > 63:
        raise ValueError("2 dims x bits must stay under the long sign bit")
    x = normalize_dim(*dims[0], bits=bits)
    y = normalize_dim(*dims[1], bits=bits)
    st: Column = F.lit(0).cast("long")
    d: Column = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        bx = F.shiftright(x, i).bitwiseAND(F.lit(1))
        by = F.shiftright(y, i).bitwiseAND(F.lit(1))
        idx = F.shiftleft(st, 2) + F.shiftleft(bx, 1) + by
        d = F.shiftleft(d, 2) + F.call_function(
            "shiftright", F.lit(_HILBERT_D), idx * 2).bitwiseAND(F.lit(3))
        st = F.call_function(
            "shiftright", F.lit(_HILBERT_S), idx * 2).bitwiseAND(F.lit(3))
    return d.cast("long")


def hilbert_sql(cols: list[tuple[str, str, str]],
                bits: int = ZORDER_BITS) -> str:
    """The DuckDB replay of :func:`hilbert_key` — the same normalize
    (clamped exact ``//``) and the same packed-table state machine as
    SQL text. Text grows O(bits^2) (each level's index substitutes the
    previous state once), ~10 KB at the default 10 bits."""
    if len(cols) != 2:
        raise ValueError("hilbert_sql is 2-D; pass exactly two dims")
    if 2 * bits > 63:
        raise ValueError("2 dims x bits must stay under the long sign bit")
    norm = [
        f"GREATEST(0, LEAST({(1 << bits) - 1},"
        f" (({c} - {lo}) * {1 << bits}) // ({hi} - {lo} + 1)))"
        for c, lo, hi in cols
    ]
    x, y = norm
    st = "0"
    d = "0"
    for i in range(bits - 1, -1, -1):
        bx = f"((({x}) >> {i}) & 1)"
        by = f"((({y}) >> {i}) & 1)"
        idx = f"((({st}) << 2) + ({bx} << 1) + {by})"
        d = f"((({d}) << 2) + (({_HILBERT_D} >> ({idx} * 2)) & 3))"
        st = f"(({_HILBERT_S} >> ({idx} * 2)) & 3)"
    return d


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
