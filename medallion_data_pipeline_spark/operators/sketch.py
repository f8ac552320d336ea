"""Count-Min Sketch primitives (Cormode/Muthukrishnan 2005).

The sketch is d rows x w buckets of exact-integer counters built from
the engine's seeded md5-affine hash family (functions/text.py — the
same portable family minhash uses), so construction is bit-reproducible
across engines and runs. Two properties make it THE frequency structure
at 100 TB:

- **O(d*w) memory at any corpus size** — one map-side-combined
  aggregation produces 256 rows from any number of input tokens.
- **Merge = counter addition.** Partial sketches from partitions,
  shards, or micro-batches sum into the sketch of the union, exactly
  (integer adds commute) — which is why the streaming sink
  (streaming/ingest.py::run_cms_stream) can land per-batch counters
  and read the live sketch as a SUM over batch partitions.

Shared by the gated query (queries/llmops.py::cms_frequency_sketch,
whose DuckDB oracle replays construction and estimation) and the
streaming accumulator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X

CMS_D = 4
CMS_W = 64


def token_hash(col=F.col("word")) -> F.Column:
    """The portable 32-bit token image (first 8 md5 hex chars) every
    hash row derives from — ONE digest per token."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def bucket_cols(h=F.col("h"), d: int = CMS_D, w: int = CMS_W):
    """The d bucket columns b0..b{d-1} for a staged token-hash column."""
    return [((F.lit(a) * h + F.lit(b)) % F.lit(X.MINHASH_PRIME)
             % F.lit(w)).alias(f"b{j}")
            for j, (a, b) in enumerate(X.minhash_params(d))]


def cms_long(tokens: DataFrame, token_col: str = "word",
             d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """(token, j, b) long form — each token occurrence's d bucket
    coordinates. Map-only."""
    w_ = tokens.withColumn("h", token_hash(F.col(token_col)))
    staged = w_.select(token_col, *bucket_cols(F.col("h"), d, w))
    return staged.select(
        token_col,
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"), F.col(f"b{j}").alias("b"))
            for j in range(d)])).alias("e")
    ).select(token_col, "e.j", "e.b")


def cms_counters(tokens: DataFrame, token_col: str = "word",
                 d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """The sketch itself: (j, b, c) counters — d*w rows from any input
    size, one map-side-combined aggregation."""
    return (cms_long(tokens, token_col, d, w)
            .groupBy("j", "b").agg(F.count(F.lit(1)).alias("c")))


def merge_counters(parts: DataFrame) -> DataFrame:
    """Merge partial sketches (any union of (j, b, c) frames): counter
    addition IS sketch union."""
    return parts.groupBy("j", "b").agg(F.sum("c").alias("c"))


def cms_estimate(words: DataFrame, counters: DataFrame,
                 token_col: str = "word", d: int = CMS_D,
                 w: int = CMS_W) -> DataFrame:
    """Point estimates for a (small) set of distinct tokens: min over
    the d counters each token hashes to. The token set broadcasts; the
    counter table is d*w rows — both joins are map-side.

    The counter join is a LEFT join with absent buckets coalesced to 0:
    a sketch stores only touched buckets, so an untouched bucket means
    a true count of 0 — an inner join would take the min over only the
    dense buckets (inflating the estimate) and would drop a token whose
    d buckets are all empty entirely. Matters for point queries against
    small or streaming sketches; invisible on dense w=64 corpora."""
    coords = cms_long(words.select(token_col).dropDuplicates([token_col]),
                      token_col, d, w)
    return (coords.join(F.broadcast(counters), ["j", "b"], "left")
            .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
            .groupBy(token_col).agg(F.min("c").alias("cms_est")))
