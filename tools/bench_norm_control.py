#!/usr/bin/env python
"""Controlled host-weather experiment for the bench calibration probe
(VERDICT r12 #1 acceptance: "a control re-run of unchanged code across
two different host windows showing normalized like-for-like within
±5% where raw drifts >10%").

Real noisy windows arrive on their own schedule, so this tool
MANUFACTURES one: `--hog N` spawns N pure-Python busy-loop processes
(NOT Spark — the no-two-Spark-processes rule still holds; this is a
deliberate, labeled simulation of external CPU pressure) for the
duration of the measured run. Usage:

    python tools/bench_norm_control.py            > /tmp/ctl_quiet.json
    python tools/bench_norm_control.py --hog 24   > /tmp/ctl_noisy.json
    python tools/bench_norm_control.py --compare /tmp/ctl_quiet.json \
        /tmp/ctl_noisy.json

The measured run times a fixed subset of registered bench entries
(min-of-warm-reps, exactly bench.py's discipline) interleaved with the
same _Calibration probe bench.py ships, then reports raw and
probe-normalized totals. --compare prints the drift of each series
between two runs.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = [
    "dedup_minhash_lsh",
    "text_analysis",
    "bm25_doc_ranking",
    "knn_cosine_sq8",
    "dedup_ngram_jaccard",
    "corpus_token_stats",
]


def _busy() -> None:
    x = 1
    while True:
        x = (x * 1103515245 + 12345) % (1 << 31)


def run(sf_dir: str, hog: int) -> dict:
    from bench import _Calibration, _release_cached_blocks
    from medallion_data_pipeline_spark.queries import REGISTRY, _load
    from medallion_data_pipeline_spark.session import get_spark

    _load()
    spark = get_spark("mdp-norm-control")
    # codegen warm-up at the smallest SF, same as bench.py
    for name in SUBSET:
        REGISTRY[name].fn(spark, "/root/testdata/sf0.001") \
            .write.format("noop").mode("overwrite").save()

    hogs: list[multiprocessing.Process] = []
    try:
        for _ in range(hog):
            p = multiprocessing.Process(target=_busy, daemon=True)
            p.start()
            hogs.append(p)

        cal = _Calibration(spark)
        cal.EVERY = 2  # denser checkpoints on the short subset
        cal.probe()
        timings: dict[str, float] = {}
        for name in SUBSET:
            reps = []
            for _ in range(3):
                t0 = time.time()
                REGISTRY[name].fn(spark, sf_dir) \
                    .write.format("noop").mode("overwrite").save()
                reps.append(round(time.time() - t0, 3))
            timings[name] = min(reps[1:]) if reps[0] > 1.0 else min(reps)
            _release_cached_blocks(spark)
            cal.tick(name)
        cal.probe()
        norm = cal.normalize(timings)
        return {
            "hog": hog,
            "sf_dir": sf_dir,
            "raw": timings,
            "norm": norm,
            "total_raw": round(sum(timings.values()), 3),
            "total_norm": round(sum(norm.values()), 3),
            "probe_points": cal.points,
        }
    finally:
        for p in hogs:
            p.terminate()


def compare(a_path: str, b_path: str) -> None:
    with open(a_path) as fh:
        a = json.load(fh)
    with open(b_path) as fh:
        b = json.load(fh)
    raw_drift = b["total_raw"] / a["total_raw"] - 1
    norm_drift = b["total_norm"] / a["total_norm"] - 1
    print(json.dumps({
        "total_raw_a": a["total_raw"], "total_raw_b": b["total_raw"],
        "raw_drift_pct": round(100 * raw_drift, 1),
        "total_norm_a": a["total_norm"], "total_norm_b": b["total_norm"],
        "norm_drift_pct": round(100 * norm_drift, 1),
    }, indent=1))


def main() -> None:
    if "--compare" in sys.argv:
        i = sys.argv.index("--compare")
        compare(sys.argv[i + 1], sys.argv[i + 2])
        return
    hog = 0
    if "--hog" in sys.argv:
        hog = int(sys.argv[sys.argv.index("--hog") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    print(json.dumps(run(sf_dir, hog)))


if __name__ == "__main__":
    main()
