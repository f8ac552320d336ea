#!/usr/bin/env python
"""Prototype measurement (r15): early repartition-by-doc_id before the
trigram explode in with_langid vs current shape. The hypothesis (guide
§2.1 "shuffle fewer bytes"): moving the slim (id, text) rows once and
letting every downstream agg/window/join inherit hashpartitioning(id)
beats shuffling ~5M exploded trigram rows twice."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from medallion_data_pipeline_spark.functions import langid as L
from medallion_data_pipeline_spark.session import get_spark, default_parallelism


def variant_repart(df, id_col, text_col, k=L.LANGID_K):
    """with_langid with norm_df repartitioned by id before explode."""
    seed_map = L.LANG_SEEDS
    spark = df.sparkSession
    profs = L.seed_profiles(spark, k)
    n_part = max(default_parallelism(), df.rdd.getNumPartitions())
    norm_df = (df.select(F.col(id_col), L.langid_norm(F.col(text_col))
                         .alias("_s"))
               .repartition(n_part, F.col(id_col)))
    doc_tri = norm_df.select(
        id_col, F.explode(L.trigram_array(F.col("_s"))).alias("tri"))
    dcounts = doc_tri.groupBy(id_col, "tri") \
        .agg(F.count(F.lit(1)).alias("c"))
    wd = W.partitionBy(id_col).orderBy(F.desc("c"), F.asc("tri"))
    dprof = (dcounts.withColumn("rd", F.row_number().over(wd))
             .filter(F.col("rd") <= k).drop("c"))
    dprof = dprof.localCheckpoint(eager=False)
    matched = (dprof.join(F.broadcast(profs), "tri")
               .groupBy(id_col, "lang")
               .agg((F.lit(k) * F.count(F.lit(1))
                     - F.sum(F.abs(F.col("rd") - F.col("rl"))))
                    .alias("_b")))
    folded = (matched
              .select(id_col, F.struct((-F.col("_b")).alias("nb"),
                                       F.col("lang").alias("lang"))
                      .alias("_e"))
              .groupBy(id_col).agg(F.collect_list("_e").alias("_es")))
    nd = dprof.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_d"))
    pad = F.array(*[F.struct(F.lit(0).cast("long").alias("nb"),
                             F.lit(lng).alias("lang"))
                    for lng in sorted(seed_map)])
    es = F.coalesce(F.col("_es"),
                    F.expr("array()").cast(
                        "array<struct<nb:bigint,lang:string>>"))
    cand = F.array_sort(F.concat(
        es, F.filter(pad, lambda p: ~F.exists(
            es, lambda m: m["lang"] == p["lang"]))))
    e1, e2 = F.element_at(cand, 1), F.element_at(cand, 2)
    out = (nd.join(folded, id_col, "left")
           .select(id_col, e1["lang"].alias("lang"),
                   (F.lit(k) * F.col("_n_d") + e1["nb"])
                   .cast("long").alias("dist"),
                   (e2["nb"] - e1["nb"]).cast("long").alias("margin")))
    missing = (df.select(id_col)
               .join(nd.select(id_col), id_col, "left_anti")
               .select(id_col,
                       F.lit(sorted(seed_map)[0]).alias("lang"),
                       F.lit(0).cast("long").alias("dist"),
                       F.lit(0).cast("long").alias("margin")))
    return out.unionByName(missing)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("proto-langid")
    from medallion_data_pipeline_spark.queries.llmops import td
    docs = td(spark, sf_dir)

    from bench import _release_cached_blocks
    reps = int(os.environ.get("REPS", "4"))

    variants = {
        "current": lambda: L.with_langid(docs, "doc_id", "text"),
        "repart": lambda: variant_repart(docs, "doc_id", "text"),
    }
    # equality first
    a = L.with_langid(docs, "doc_id", "text")
    b = variant_repart(docs, "doc_id", "text")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print("mismatch rows:", diff)
    _release_cached_blocks(spark)

    for name, mk in variants.items():
        ts = []
        for _ in range(reps):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            _release_cached_blocks(spark)
        print(f"{name}: min={min(ts)} reps={ts}")

    # plan shape: exchanges in each
    for name, mk in variants.items():
        plan = mk()._jdf.queryExecution().executedPlan().toString()
        print(name, "Exchange count:", plan.count("Exchange"))


if __name__ == "__main__":
    main()
