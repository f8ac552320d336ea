"""End-to-end crawl-ingest pipeline (VERDICT r13 #6): one entry point
that takes a landing directory of raw JSONL crawl shards through the
standard web-ingest stages and lands each layer as parquet with
per-stage audited counts — the crawl dual of plans/corpus.py's
curation pipeline, so the tier's composed cost is a tracked bench
number rather than a sum of query walls.

    landing JSONL -> permissive ingest (corrupt-line capture)
        -> HTML extraction (title / text / links)
        -> URL canonicalization (+ host identity)
        -> frontier blocklist filter (rule table, lowest rule wins)
        -> dedup: canonical-URL keep-lowest, then content-digest
           keep-lowest; the surviving digests also build the
           formula-sized Bloom seen-set artifact the NEXT crawl
           increment probes (operators/sketch.py::bloom_m_for)
        -> language-ID gate (functions/langid.py, keep_langs)
        -> quality gate (plans/corpus.py Gopher/C4 rules)

Every stage is a composition of the oracle-gated operators
(sources/jsonl.py, functions/html.py, functions/urls.py,
functions/langid.py, plans/corpus.py), so the pipeline inherits their
verified semantics; this module adds layering, writes, and stats.
All stages are deterministic — re-running on the same landing dir
reproduces byte-identical layers.

Scale shape: ingest/extract/canonicalize/frontier are scan-local
expressions (the rules side broadcasts); both dedup stages shuffle on
content keys (canonical_url, digest); the Bloom artifact is one
map-side-combined bit_or; langid is one explode + a doc-partitioned
window + broadcast joins; the gate is scan-local. Nothing in the
composition introduces a join or window that wouldn't hold at 100 TB.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from .corpus import StageResult, quality_gate
from ..sources.testdata import load_table

#: landing contract for synthesized + real crawl shards
CRAWL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("url", T.StringType()),
    T.StructField("html", T.StringType()),
])

#: frontier blocklist (kind, pattern) — same rule forms as the gated
#: crawl_frontier_filter query
CRAWL_BLOCK_RULES = [
    (1, "host_suffix", ".example.net"),
    (2, "path_prefix", "/page/13"),
]


def synthesize_crawl_shards(spark: SparkSession, sf_dir: str,
                            landing_dir: str, replicas: int = 10,
                            shards: int = 8,
                            corrupt_every: int = 997) -> int:
    """Materialize a crawl landing directory from the documents table:
    each document appears ``replicas`` times under rotating messy URL
    forms (mixed-case scheme/host + default port + trailing slash,
    tracking params + fragment, clean) and two host families (one of
    which the frontier blocklist rejects), with the text wrapped in a
    deterministic HTML skeleton; every ``corrupt_every``-th line is
    truncated mid-object to exercise the corrupt-line capture. Returns
    the number of lines written. Deterministic end to end."""
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "source", "text")
    reps = F.explode(F.array(*[F.lit(i) for i in range(replicas)]))
    raw = docs.select("doc_id", "source", "text", reps.alias("rep"))
    rid = (F.col("doc_id") * replicas + F.col("rep"))
    page = F.col("doc_id").cast("string")  # one page per document —
    # the replicas' mess forms collapse, distinct docs never do
    tld = F.when(F.col("doc_id") % 11 == 0, F.lit(".example.net")) \
        .otherwise(F.lit(".example.com"))
    hostpart = F.concat(F.col("source"), tld)
    pathpart = F.concat(F.lit("/page/"), page)
    # mess form 1 uppercases ONLY scheme+host and puts :80 on the
    # HOSTPORT (canonicalization lowercases scheme/host and strips
    # default ports from the hostport — an uppercased path or a
    # port-after-path would be a genuinely different page and would
    # never collapse)
    url = F.when(
        F.col("rep") % 3 == 0, F.concat(F.lit("http://"), hostpart,
                                        pathpart)
    ).when(
        F.col("rep") % 3 == 1,
        F.concat(F.lit("HTTP://"), F.upper(hostpart), F.lit(":80"),
                 pathpart, F.lit("/"))
    ).otherwise(
        F.concat(F.lit("http://"), hostpart, pathpart,
                 F.lit("?utm_source=feed&ref=x#top")))
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><h1>Heading</h1><p>"),
        F.col("text"),
        F.lit("</p><a href=\"/next\">next</a></body></html>"))
    lines = raw.select(
        F.to_json(F.struct(rid.alias("doc_id"), url.alias("url"),
                           html.alias("html"))).alias("value"))
    # deterministic corrupt lines: truncate mid-object
    lines = lines.withColumn(
        "value",
        F.when(F.xxhash64("value") % corrupt_every == 0,
               F.substring("value", 1, 40)).otherwise(F.col("value")))
    lines.repartition(shards).write.mode("overwrite").text(landing_dir)
    # count the WRITTEN shards — re-counting `lines` would replay the
    # whole synthesis lineage a second time just for the number
    return int(spark.read.text(landing_dir).count())


def frontier_admit(df: DataFrame) -> DataFrame:
    """Blocklist filter over canonicalized rows: joins the broadcast
    rule table on host/path predicates, keeps rows no rule matches
    (same semantics as the gated crawl_frontier_filter query)."""
    spark = df.sparkSession
    rules = spark.createDataFrame(CRAWL_BLOCK_RULES,
                                  "rule_id int, kind string, pattern string")
    path = F.regexp_replace("canonical_url", r"^https?://[^/]*", "")
    d = df.withColumn("_path", path)
    cond = (
        ((F.col("kind") == "host_suffix")
         & F.col("url_host").endswith(F.col("pattern")))
        | ((F.col("kind") == "path_prefix")
           & F.col("_path").startswith(F.col("pattern"))))
    hits = (d.join(F.broadcast(rules), cond)
            .groupBy("doc_id").agg(F.min("rule_id").alias("blocked_by")))
    return (d.join(hits, "doc_id", "left")
            .filter(F.col("blocked_by").isNull())
            .drop("blocked_by", "_path"))


def run_crawl_pipeline(spark: SparkSession, landing_dir: str,
                       out_dir: str, keep_langs: tuple[str, ...] = ("en",),
                       bloom_fpr: float = 0.01) -> list[StageResult]:
    """Run the crawl tier end-to-end over ``landing_dir``'s JSONL
    shards and land the layers under ``out_dir``: bronze/ rejects/
    extracted/ admitted/ deduped/ bloom_seen/ corpus/. Returns
    per-stage audited counts + wall times."""
    from ..functions import langid as LG
    from ..functions.html import with_html_extraction
    from ..functions.urls import with_canonical_url
    from ..operators import sketch as K
    from ..sources.jsonl import read_jsonl, split_rejects

    results: list[StageResult] = []

    def _stage(name: str, n_in: int, df: DataFrame, path: str,
               t0: float) -> int:
        df.write.mode("overwrite").parquet(os.path.join(out_dir, path))
        n_out = spark.read.parquet(os.path.join(out_dir, path)).count()
        results.append(StageResult(name, n_in, n_out,
                                   round(time.time() - t0, 2)))
        return n_out

    t0 = time.time()
    good, bad = split_rejects(read_jsonl(spark, landing_dir, CRAWL_SCHEMA))
    bad.write.mode("overwrite").parquet(os.path.join(out_dir, "rejects"))
    n = _stage("ingest", -1, good, "bronze", t0)
    bronze = spark.read.parquet(os.path.join(out_dir, "bronze"))

    t0 = time.time()
    extracted = with_html_extraction(bronze, "html") \
        .select("doc_id", "url", "title",
                F.col("text_extracted").alias("text"),
                F.size("links").alias("n_links"))
    n = _stage("html_extract", n, extracted, "extracted", t0)
    extracted = spark.read.parquet(os.path.join(out_dir, "extracted"))

    t0 = time.time()
    admitted = frontier_admit(with_canonical_url(extracted, "url"))
    n = _stage("canonicalize_frontier", n, admitted, "admitted", t0)
    admitted = spark.read.parquet(os.path.join(out_dir, "admitted"))

    t0 = time.time()
    # keep-lowest per canonical URL (crawl identity), then per content
    # digest (exact dedup) — both one shuffle on the content key
    by_url = admitted.withColumn(
        "_rk", F.row_number().over(
            W.partitionBy("canonical_url").orderBy("doc_id"))) \
        .filter(F.col("_rk") == 1).drop("_rk")
    digested = by_url.withColumn("digest", F.md5(F.col("text")))
    deduped = digested.withColumn(
        "_rk", F.row_number().over(
            W.partitionBy("digest").orderBy("doc_id"))) \
        .filter(F.col("_rk") == 1).drop("_rk")
    n = _stage("dedup", n, deduped, "deduped", t0)
    deduped = spark.read.parquet(os.path.join(out_dir, "deduped"))

    # the seen-set artifact the next crawl increment probes: one
    # filter over this run's surviving digests, sized by the
    # production formula at the observed count
    t0 = time.time()
    m = K.bloom_m_for(max(int(n), 1), bloom_fpr)
    K.bloom_bits(deduped.select(F.col("digest").alias("item")), m=m) \
        .write.mode("overwrite") \
        .parquet(os.path.join(out_dir, "bloom_seen"))
    results.append(StageResult("bloom_seen", n, m,
                               round(time.time() - t0, 2)))

    t0 = time.time()
    lang = LG.with_langid(deduped, "doc_id", "text")
    kept = deduped.join(
        lang.filter(F.col("lang").isin(list(keep_langs))
                    & (F.col("margin") > 0)).select("doc_id"),
        "doc_id", "left_semi")
    n = _stage("langid_gate", n, kept, "langpass", t0)
    kept = spark.read.parquet(os.path.join(out_dir, "langpass"))

    t0 = time.time()
    final = quality_gate(kept)
    n = _stage("quality_gate", n, final, "corpus", t0)
    return results
