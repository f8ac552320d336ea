#!/usr/bin/env python
"""Round-10 measurement: the index-side per-bucket cap for incremental
dedup (VERDICT r9 "Next round #3" — the documented-but-unbuilt scale
mechanism, now implemented as band_index(max_bucket=) +
streaming/ingest.py's append-time capacity check).

The scenario is the daily crawl shape: a maintained 50k-doc corpus
whose boilerplate clique (1.5k docs, one 60-token template + 3 unique
tokens each, pairwise 3-shingle Jaccard ~0.85) owns one giant band
bucket per band; a fixed 2k-doc incoming batch — half clique newcomers
(every one a true near-dup the probe must flag), half fresh docs —
probes the maintained (doc, band_key) index. Uncapped, each clique
newcomer's candidates multiply by the FULL bucket size (1.5k corpus
members x matching bands -> ~1.5M exact-Jaccard verifications for the
1k newcomers); capped at N=64 lowest ids per bucket, candidates are
bounded at 64 per newcomer per band and the verify work stops growing
with corpus size. Correctness contract checked in-run: the FLAG SET is
identical (every clique newcomer flagged both ways — any retained
member still matches at J~0.85 >= 0.4), only dup_of/jaccard may name a
different clique member. Also rowed: index build cost (one extra
window shuffle when capped) and index sizes.

At 100 TB the uncapped curve is the disqualifying one: the clique
bucket grows with the crawl, so per-batch probe cost grows with
|corpus| — the cap makes it O(batch x N), flat in corpus size.

Usage: python tools/scale_index_cap.py [--regen]
Writes the measurement JSON to stdout; corpus parquet reused from
tools/scale_skew.py's /tmp/mdp_skew_keep (regenerated if absent).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from medallion_data_pipeline_spark.operators import dedup as D
from medallion_data_pipeline_spark.sources.testdata import load_table
from tools.scale_heavy import get_ui_spark
from tools.scale_skew import SKEW_DIR, ensure_skew_documents, measure

CAP = 64
N_CLIQUE_NEW = 1_000
N_FRESH_NEW = 1_000
IDX_DIR = "/tmp/mdp_index_cap"


def build_batch(spark):
    """2k incoming docs: 1k clique newcomers (same 60-token template as
    the corpus clique + 3 unique tokens -> J~0.85 vs every member) and
    1k fresh docs with disjoint shingles."""
    template = " ".join(f"boiler{j}" for j in range(60))
    clique_new = spark.range(N_CLIQUE_NEW).select(
        (F.col("id") + 60_000_000).alias("doc_id"),
        F.concat(F.lit(template + " "),
                 F.format_string("nw%da nw%db nw%dc",
                                 "id", "id", "id")).alias("text"),
    )
    fresh = spark.range(N_FRESH_NEW).select(
        (F.col("id") + 70_000_000).alias("doc_id"),
        F.format_string(
            "fresh document %d covering disjoint topic %d with vocabulary "
            "%d entirely absent from the corpus shingle space %d item %d",
            "id", "id", "id", "id", "id").alias("text"),
    )
    return clique_new.unionByName(fresh)


def main():
    spark = get_ui_spark()
    if "--regen" in sys.argv:
        import shutil
        shutil.rmtree(SKEW_DIR, ignore_errors=True)
    ensure_skew_documents(spark, SKEW_DIR)
    corpus = load_table(spark, SKEW_DIR, "documents") \
        .select("doc_id", "text")
    batch = build_batch(spark).localCheckpoint()

    out = {}
    # maintained-index builds (one-shot; the streaming sink maintains
    # the same invariant incrementally)
    os.makedirs(IDX_DIR, exist_ok=True)
    for label, cap in (("uncapped", None), (f"capped{CAP}", CAP)):
        dst = os.path.join(IDX_DIR, f"idx_{label}.parquet")
        t0 = time.time()
        D.band_index(corpus, max_bucket=cap) \
            .write.mode("overwrite").parquet(dst)
        build_s = time.time() - t0
        idx = spark.read.parquet(dst)
        n_rows = idx.count()
        max_bucket = idx.groupBy("band_key").count() \
            .agg(F.max("count")).first()[0]
        print(f"index {label}: build={build_s:.1f}s rows={n_rows} "
              f"max_bucket={max_bucket}", flush=True)
        out[f"index_{label}"] = {
            "build_s": round(build_s, 1), "rows": n_rows,
            "max_bucket": max_bucket}

    print(f"== incremental_near_duplicates: fixed {N_CLIQUE_NEW + N_FRESH_NEW}"
          f"-doc batch vs 51.5k corpus (1.5k clique) ==", flush=True)
    flagged = {}
    for label in ("uncapped", f"capped{CAP}"):
        idx = spark.read.parquet(
            os.path.join(IDX_DIR, f"idx_{label}.parquet"))
        out[f"probe_{label}"] = measure(
            spark, f"probe_{label}",
            lambda idx=idx: D.incremental_near_duplicates(
                corpus, batch, corpus_index=idx))
        flagged[label] = {
            r.doc_id for r in D.incremental_near_duplicates(
                corpus, batch, corpus_index=idx).select("doc_id").collect()}

    same = flagged["uncapped"] == flagged[f"capped{CAP}"]
    n_clique_flagged = sum(1 for d in flagged[f"capped{CAP}"]
                           if 60_000_000 <= d < 70_000_000)
    print(f"flag-set equal: {same}; clique newcomers flagged: "
          f"{n_clique_flagged}/{N_CLIQUE_NEW}", flush=True)
    out["flag_set_equal"] = same
    out["clique_newcomers_flagged"] = n_clique_flagged
    print(json.dumps(out))


if __name__ == "__main__":
    main()
