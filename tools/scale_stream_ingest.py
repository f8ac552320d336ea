#!/usr/bin/env python
"""Round-10 measurement: streaming incremental-dedup ingest throughput
with and without the maintained index's per-bucket cap
(streaming/ingest.py::run_dedup_ingest(max_bucket=)).

Stream shape: 10 landing files x 500 docs. Each batch carries 400
unique docs (disjoint shingles) plus 100 boilerplate docs (one
60-token template + 3 unique tokens, mutual 3-shingle Jaccard
= 58 shared / 64 union ~ 0.906). At threshold=0.95 the boilerplate
docs are ACCEPTED (0.906 < 0.95 — a first cut at threshold 0.9
rejected them all, bucket never grew, and the capped run only paid
the capacity-lookup overhead: the cap needs accepted-but-colliding
docs to matter) yet collide in the template's band buckets — so the
uncapped maintained index grows one hot bucket by ~100 members per
batch, and every later batch's 100 boilerplate newcomers each verify
against the WHOLE bucket: per-batch probe cost grows linearly with
stream position, total cost quadratically with stream length. Capped
at N=64, the bucket stops growing past the cap and per-batch cost is
flat.

Measured (min-of-2 drains each): uncapped wall 47.9 s with the hot
bucket at 887 members by end-of-stream; capped64 wall 33.0 s
(1.45x at just 10 batches — the uncapped curve is quadratic in
stream length, so the ratio grows without bound), accepted doc sets
md5-identical.

This is the streaming dual of tools/scale_index_cap.py's batch curve
(SCALING.md addendum 6) — the cost model is the same; here it
compounds across the stream's lifetime, which is exactly the
always-on-ingest shape where the cap matters most.

Usage: python tools/scale_stream_ingest.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = 10
N_UNIQUE = 400
N_BOILER = 100
THRESHOLD = 0.95
CAP = 64

_TEMPLATE = " ".join(f"boiler{j}" for j in range(60))


def write_landing(land: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(land, exist_ok=True)
    now = time.time()
    for b in range(N_BATCHES):
        ids, texts = [], []
        base = b * 10_000
        for i in range(N_UNIQUE):
            d = base + i
            ids.append(d)
            texts.append(
                f"unique document {d} covering topic {d * 7} with "
                f"vocabulary {d * 13} items {d * 3} and {d * 11} entries")
        for i in range(N_BOILER):
            d = base + 5_000 + i
            ids.append(d)
            texts.append(_TEMPLATE + f" uq{d}a uq{d}b uq{d}c")
        path = os.path.join(land, f"b{b:02d}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string())}), path)
        os.utime(path, (now - 600 + b * 10, now - 600 + b * 10))


def drain(spark, land: str, max_bucket):
    from medallion_data_pipeline_spark.streaming import ingest as SI

    wh = tempfile.mkdtemp(prefix="mdp_stream_cap_")
    cp = tempfile.mkdtemp(prefix="mdp_stream_cp_")
    t0 = time.time()
    SI.run_dedup_ingest(spark, land, wh, cp, threshold=THRESHOLD,
                        max_files_per_trigger=1, max_bucket=max_bucket)
    wall = time.time() - t0
    docs = spark.read.parquet(os.path.join(wh, "silver", "documents"))
    idx = spark.read.parquet(os.path.join(wh, "silver", "doc_band_index"))
    from pyspark.sql import functions as F
    stats = {
        "wall_s": round(wall, 1),
        "accepted": docs.count(),
        "index_rows": idx.count(),
        "max_bucket": idx.groupBy("band_key").count()
        .agg(F.max("count")).first()[0],
        "accepted_ids_md5": docs.select(
            F.md5(F.concat_ws(",", F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"))))).first()[0],
    }
    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(cp, ignore_errors=True)
    return stats


def main():
    from tools.scale_heavy import get_ui_spark

    spark = get_ui_spark()
    land = tempfile.mkdtemp(prefix="mdp_stream_land_")
    write_landing(land)
    out = {}
    for label, cap in (("uncapped", None), (f"capped{CAP}", CAP)):
        # min-of-2 drains, fresh warehouse/checkpoint each
        runs = [drain(spark, land, cap) for _ in range(2)]
        best = min(runs, key=lambda r: r["wall_s"])
        print(f"{label}: walls={[r['wall_s'] for r in runs]} "
              f"accepted={best['accepted']} index_rows={best['index_rows']} "
              f"max_bucket={best['max_bucket']}", flush=True)
        out[label] = best
    out["accepted_set_equal"] = (
        out["uncapped"]["accepted_ids_md5"]
        == out[f"capped{CAP}"]["accepted_ids_md5"])
    print("accepted-set equal:", out["accepted_set_equal"], flush=True)
    shutil.rmtree(land, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
