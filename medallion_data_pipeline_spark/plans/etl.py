"""Pipeline orchestrator — the reference's etl.py CLI re-shaped for
Spark (etl.py:93-187): `--layer bronze|silver|gold|quality|forecast|all` with
fail-fast gating (silver only runs if bronze landed, etc.) and
idempotent overwrite semantics per layer.

Usage:
    python -m medallion_data_pipeline_spark.plans.etl --layer all \
        --warehouse /tmp/mdp_warehouse [--fixtures]
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import SparkSession

from ..session import get_spark
from . import bronze, fixtures, gold, quality, silver


def run_pipeline(spark: SparkSession, warehouse: str, layer: str = "all",
                 use_fixtures: bool = True, csv_dir: str | None = None) -> bool:
    t0 = time.time()
    ok = True

    if layer in ("bronze", "all"):
        if csv_dir:
            counts = bronze.ingest_csv_dir(spark, csv_dir, warehouse)
        elif use_fixtures:
            counts = bronze.write_bronze(fixtures.generate_bronze(spark), warehouse)
        else:
            raise ValueError("bronze needs --fixtures or --csv-dir")
        ok = all(v > 0 for v in counts.values())
        print(f"[bronze] {counts} ok={ok} ({time.time() - t0:.1f}s)")
        if not ok:
            return False

    if layer in ("silver", "all"):
        t = time.time()
        results = silver.run_silver(spark, warehouse)
        for r in results:
            print(f"[silver] {r.name}: in={r.rows_in} out={r.rows_out} rejected={r.rows_rejected}")
        ok = all(r.rows_out > 0 for r in results)
        print(f"[silver] ok={ok} ({time.time() - t:.1f}s)")
        if not ok:
            return False

    if layer in ("gold", "all"):
        t = time.time()
        counts = gold.run_gold(spark, warehouse)
        ok = all(v > 0 for v in counts.values())
        print(f"[gold] {counts} ok={ok} ({time.time() - t:.1f}s)")
        if not ok:
            return False

    if layer == "forecast":
        # deliberately NOT part of "all": the reference runs forecasting
        # as its own entry point (python forecasting.py), separate from
        # etl.py --layer all (etl.py:153-167, forecasting.py:434-449)
        t = time.time()
        from . import forecasting
        fc = forecasting.run_forecasts(spark, warehouse)
        n = fc.count()
        ok = n > 0
        print(f"[forecast] {n} forecast rows ok={ok} ({time.time() - t:.1f}s)")
        if not ok:
            return False

    if layer in ("quality", "all"):
        t = time.time()
        checks = quality.run_quality_checks(spark, warehouse)
        failed = checks.filter(~checks.passed).collect()
        for row in failed:
            print(f"[quality] FAIL {row.check_name} on {row.table_name}: {row.violations} violations")
        recon = quality.reconcile_silver_gold(spark, warehouse)
        for row in recon.collect():
            print(f"[quality] reconcile {row.measure}: silver={row.silver_value} "
                  f"gold={row.gold_value} diff={row.pct_diff}% passed={row.passed}")
        ok = not failed and all(r.passed for r in recon.collect())
        print(f"[quality] ok={ok} ({time.time() - t:.1f}s)")

    print(f"[pipeline] total {time.time() - t0:.1f}s ok={ok}")
    return ok


def main() -> int:
    ap = argparse.ArgumentParser(description="Medallion pipeline (Spark)")
    ap.add_argument("--layer", default="all",
                    choices=["bronze", "silver", "gold", "quality", "forecast", "all"])
    ap.add_argument("--warehouse", default="/tmp/mdp_warehouse")
    ap.add_argument("--fixtures", action="store_true", default=True,
                    help="generate deterministic dirty fixtures for bronze")
    ap.add_argument("--csv-dir", default=None, help="ingest bronze from CSVs instead")
    args = ap.parse_args()
    spark = get_spark("mdp-etl")
    ok = run_pipeline(spark, args.warehouse, args.layer,
                      use_fixtures=args.fixtures, csv_dir=args.csv_dir)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
