"""Dense-vector math over ``array<float/double>`` embedding columns.

Built entirely from Spark's higher-order array functions (zip_with /
aggregate / transform) so the dot products run inside codegen — no
Python UDF, no MLlib Vector conversion. At 100 TB the brute-force path
is a cross-join bounded by a candidate filter (LSH bucket / IVF cell);
see operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d)


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def sign_lsh_key(a: Column, n_planes: int = 8, seed: int = 7) -> Column:
    """Random-hyperplane (sign) LSH bucket key for cosine similarity.

    Deterministic pseudo-planes: plane p's component j is derived from
    md5(seed:p:j) -> uniform in [-1, 1). The key is the n_planes-bit
    sign pattern of the projections. Same-bucket vectors are cosine
    neighbors with high probability; used to prune the ANN cross-join.
    """
    key = F.lit(0).cast("long")
    for p in range(n_planes):
        # deterministic plane: component j = (md5(seed:p:j)[:8] as int) scaled
        proj = F.aggregate(
            F.zip_with(
                a,
                F.sequence(F.lit(0), F.size(a) - 1),
                lambda x, j: x * (
                    F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.lit(p), j)), 1, 8), 16, 10)
                    .cast("double") / F.lit(float(2 ** 31)) - F.lit(1.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        key = key + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return key
