#!/usr/bin/env python
"""One-off profile of the cold pipeline_silver_50k bench entry
(VERDICT r9 next-round #2): replicate bench.py's exact sequence —
2k-order warmup, then two 50k reps on fresh warehouses — with
per-table and per-phase wall timing inside run_silver, to locate the
cold-run gap (3.59-3.85 s measured vs the 2.85 s same-session DAG).

Usage: python tools/profile_silver.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medallion_data_pipeline_spark.plans import bronze, fixtures, silver
from medallion_data_pipeline_spark.session import get_spark


def timed_silver(spark, wh, run_id):
    """run_silver with per-table timing (same concurrency layout)."""
    from concurrent.futures import ThreadPoolExecutor

    from medallion_data_pipeline_spark.plans.silver import (
        _CLEANERS, _split_and_write, _write_dq_results, _write_etl_log)
    from medallion_data_pipeline_spark.plans.bronze import read_bronze

    order = ["suppliers", "warehouses", "retail_stores", "products",
             "inventory", "supply_orders"]
    t_start = time.time()
    spans = {}

    def _process(name):
        t0 = time.time()
        raw = read_bronze(spark, wh, name)
        cleaned, reason = _CLEANERS[name](raw)
        t_plan = time.time()
        out = _split_and_write(raw, cleaned, reason, name, wh, run_id)
        spans[name] = (round(t0 - t_start, 2), round(t_plan - t0, 2),
                       round(time.time() - t_plan, 2))
        return out

    with ThreadPoolExecutor(max_workers=len(order)) as pool:
        outcomes = list(pool.map(_process, order))
    t_tables = time.time()

    results = [r for r, _, _ in outcomes]
    checks = [c for _, cs, _ in outcomes for c in cs]
    rej = None
    for _, _, r in outcomes:
        rej = r if rej is None else rej.unionByName(r)
    with ThreadPoolExecutor(max_workers=3) as tail:
        for f in [
            tail.submit(lambda: rej.write.mode("append").parquet(
                os.path.join(wh, "audit", "rejected_rows"))),
            tail.submit(_write_etl_log, spark, wh, results, run_id),
            tail.submit(_write_dq_results, spark, wh, checks),
        ]:
            f.result()
    t_end = time.time()
    print(f"  tables phase: {t_tables - t_start:.2f}s  "
          f"audit tail: {t_end - t_tables:.2f}s  total: {t_end - t_start:.2f}s")
    for name in order:
        s, plan, act = spans[name]
        print(f"    {name:14s} start+{s:5.2f}s plan={plan:5.2f}s "
              f"write+stats={act:5.2f}s")


def main():
    spark = get_spark("profile-silver")

    # warmup exactly as bench.py does
    wh_warm = tempfile.mkdtemp(prefix="mdp_prof_warm_")
    try:
        bronze.write_bronze(fixtures.generate_bronze(spark, n_orders=2000),
                            wh_warm)
        silver.run_silver(spark, wh_warm, run_id="warm")
    finally:
        shutil.rmtree(wh_warm, ignore_errors=True)

    for rep in range(2):
        wh = tempfile.mkdtemp(prefix="mdp_prof_wh_")
        try:
            t0 = time.time()
            bronze.write_bronze(
                fixtures.generate_bronze(spark, n_orders=50000), wh)
            print(f"rep {rep}: bronze {time.time() - t0:.2f}s")
            timed_silver(spark, wh, run_id=f"prof{rep}")
        finally:
            shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
