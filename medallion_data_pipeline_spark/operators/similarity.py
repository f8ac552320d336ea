"""Similarity search over embedding columns (array<float>).

Two paths:

- ``knn_bruteforce``: exact top-k cosine neighbors. The query set is
  broadcast against the candidate corpus, so the plan is a single
  broadcast-nested-loop with codegen'd array math — correct baseline at
  any corpus size as long as |queries| is bounded.
- ``knn_lsh``: sign-random-projection LSH buckets prune the candidate
  set before the exact cosine — the 100 TB path. Buckets come from
  deterministic md5-derived hyperplanes (functions/vectors.py), so
  results are reproducible run-to-run and engine-to-engine.

No MLlib: higher-order array functions keep everything inside
whole-stage codegen and avoid Vector serialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import vectors as V


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def knn_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (excluding
    itself). Embeddings are cast float->double BEFORE the products so
    the arithmetic is engine-portable (float*float truncates)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            V.cosine(F.col("qv"), F.col("cv")).alias("cos_raw"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos_raw", 6).alias("cosine"))
    )


def knn_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            n_planes: int = 8, seed: int = 7, dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign-LSH
    bucket, then exact cosine within it. At scale the bucket join is an
    equi-join (shuffle on bucket key) instead of a cross join; recall
    is tuned by n_planes (fewer planes = bigger buckets = higher
    recall, more compute)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        V.sign_lsh_key(_as_double(F.col(vec_col)), n_planes, seed, dim).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        V.sign_lsh_key(_as_double(F.col(vec_col)), n_planes, seed, dim).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", V.cosine(F.col("qv"), F.col("cv")).alias("cos_raw"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos_raw", 6).alias("cosine"))
    )
