"""End-to-end medallion pipeline test on the dirty fixture data:
bronze -> silver (clean/reject/audit) -> gold marts -> the reference's
12 DQ checks (SURVEY §5) + cross-layer reconciliation."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from medallion_data_pipeline_spark.plans import bronze, fixtures, gold, quality, silver


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    bronze.write_bronze(fixtures.generate_bronze(spark, n_orders=2000), wh)
    silver.run_silver(spark, wh, run_id="silver_test")
    gold.run_gold(spark, wh)
    yield wh
    shutil.rmtree(wh, ignore_errors=True)


def test_silver_rejects_are_audited(spark, warehouse):
    rejected = spark.read.parquet(f"{warehouse}/audit/rejected_rows")
    assert rejected.count() > 0
    reasons = {r.reason for r in rejected.select("reason").distinct().collect()}
    assert "invalid_quantity" in reasons or "invalid_order_date" in reasons
    # payload is valid JSON of the raw row
    sample = rejected.select(F.get_json_object("payload", "$.supply_order_id").alias("k")) \
        .filter(F.col("k").isNotNull())
    assert sample.count() > 0
    # run_id threaded through (reference silver_builder.py:293)
    assert {r.run_id for r in rejected.select("run_id").distinct().collect()} == {"silver_test"}


def test_etl_log_counts_reconcile(spark, warehouse):
    log = spark.read.parquet(f"{warehouse}/audit/etl_log")
    for row in log.collect():
        assert row.rows_in == row.rows_out + row.rows_rejected
        assert row.rows_out > 0


def test_silver_cleaning_applied(spark, warehouse):
    orders = silver.read_silver(spark, warehouse, "supply_orders")
    dtypes = dict(orders.dtypes)
    assert dtypes["quantity"] == "bigint"
    assert dtypes["order_date"] == "date"
    assert dtypes["is_calculation_correct"] == "boolean"
    # statuses fully canonicalized
    statuses = {r.status for r in orders.select("status").distinct().collect()}
    assert statuses <= {"pending", "shipped", "delivered", "cancelled", "unknown"}
    # no rejected rows leaked
    assert orders.filter(F.col("quantity").isNull() | F.col("order_date").isNull()).count() == 0
    products = silver.read_silver(spark, warehouse, "products")
    cats = {r.main_category for r in products.select("main_category").distinct().collect()}
    assert "Automotive Parts" in cats        # typo map canonicalized
    assert not any("autmootive" in c.lower() for c in cats)


def test_gold_marts_nonempty_and_typed(spark, warehouse):
    ms = gold.read_gold(spark, warehouse, "monthly_sales_performance")
    assert ms.count() > 0
    dash = gold.read_gold(spark, warehouse, "supply_chain_dashboard")
    assert dash.count() > 0
    # partitioned output: order_year_month is a partition column
    assert "order_year_month" in dash.columns
    meta = gold.read_gold(spark, warehouse, "table_metadata")
    assert meta.count() == 4


def test_all_twelve_gold_dq_checks_pass(spark, warehouse):
    checks = quality.run_quality_checks(spark, warehouse)
    rows = checks.collect()
    assert len(rows) == 12
    failed = [(r.check_name, r.violations) for r in rows if not r.passed]
    assert failed == []


def test_silver_gold_reconciliation_within_tolerance(spark, warehouse):
    recon = quality.reconcile_silver_gold(spark, warehouse)
    assert all(r.passed for r in recon.collect())


def test_legacy_gold_views(spark, warehouse):
    inv = silver.read_silver(spark, warehouse, "inventory")
    wh = silver.read_silver(spark, warehouse, "warehouses")
    prod = silver.read_silver(spark, warehouse, "products")
    orders = silver.read_silver(spark, warehouse, "supply_orders")
    stores = silver.read_silver(spark, warehouse, "retail_stores")

    summary = gold.build_inventory_summary(inv, wh, prod)
    assert summary.count() > 0
    assert summary.filter(F.col("inventory_value_at_cost") < 0).count() == 0

    metrics = gold.build_supply_order_metrics(orders).collect()
    assert sum(r.order_count for r in metrics) == orders.count()

    perf = gold.build_retail_store_performance(orders, stores)
    rows = perf.collect()
    assert len(rows) > 0
    # only active stores appear; stores without orders survive (left join)
    assert all(r.order_count >= 0 for r in rows)


def test_query_runner_sample_queries(spark, warehouse):
    from medallion_data_pipeline_spark.api import SAMPLE_QUERIES, MedallionEngine

    eng = MedallionEngine(spark, warehouse)
    eng.register_views()
    for name, sql in SAMPLE_QUERIES.items():
        df, secs, preview = eng.sql(sql)
        assert df.count() > 0, name
        assert len(preview) > 0, name


def test_silver_rerun_is_idempotent(spark, warehouse):
    before = {t: silver.read_silver(spark, warehouse, t).count()
              for t in silver.SILVER_TABLES}
    silver.run_silver(spark, warehouse, run_id="silver_test_2")
    after = {t: silver.read_silver(spark, warehouse, t).count()
             for t in silver.SILVER_TABLES}
    assert before == after   # overwrite semantics: same input -> same output


def test_bronze_json_ingest(spark, tmp_path):
    import json as _json

    from medallion_data_pipeline_spark.plans import bronze as B

    jd = tmp_path / "json_land"
    jd.mkdir()
    rows = [
        {"supplier_id": 1, "supplier_name": "Acme", "contact_email": "a@x.com",
         "phone_number": "555-0001"},
        {"supplier_id": 1, "supplier_name": "Acme v2", "contact_email": "a2@x.com",
         "phone_number": "555-0001"},  # pk dup: one survives
        {"supplier_id": 2, "supplier_name": "Beta", "contact_email": "b@x.com",
         "phone_number": "555-0002"},
    ]
    with open(jd / "suppliers.jsonl", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
        f.write("{this is not json\n")  # must not fail the load

    wh = str(tmp_path / "wh_json")
    counts = B.ingest_json_dir(spark, str(jd), wh)
    assert counts["suppliers"] == 3  # 2 valid pks + 1 corrupt-record row
    landed = spark.read.parquet(f"{wh}/bronze/suppliers")
    assert "_corrupt_record" in landed.columns
    assert landed.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    assert {r.supplier_id for r in landed.select("supplier_id").collect()} == {1, 2, None}


def test_silver_empty_table_yields_zero_counts(spark, tmp_path):
    """A zero-row bronze table must flow through silver as honest zero
    counts (observe sums NULL over empty input; the stats normalizer
    maps that to 0), not a crash or a null TableResult."""
    wh = str(tmp_path / "wh_empty")
    dfs = fixtures.generate_bronze(spark, n_orders=50)
    dfs["suppliers"] = dfs["suppliers"].filter(F.lit(False))
    bronze.write_bronze(dfs, wh)
    results = {r.name: r for r in silver.run_silver(spark, wh, run_id="e")}
    sup = results["suppliers"]
    assert (sup.rows_in, sup.rows_out, sup.rows_rejected) == (0, 0, 0)
    assert spark.read.parquet(f"{wh}/silver/suppliers").count() == 0


def test_eda_report_generates_all_sections(spark, tmp_path):
    """tools/eda_report.py (the Spark-native twin of the reference's
    eda/supply_chain_eda.py) must produce the markdown report with all
    seven analysis sections, a non-empty insights list, and the CSV
    exports, against a freshly built warehouse."""
    import subprocess
    import sys

    from medallion_data_pipeline_spark.plans import (bronze, fixtures,
                                                     gold, silver)

    wh = str(tmp_path / "wh")
    bronze.write_bronze(fixtures.generate_bronze(spark, n_orders=2000), wh)
    silver.run_silver(spark, wh, run_id="eda-test")
    gold.run_gold(spark, wh)

    out = str(tmp_path / "eda_out")
    r = subprocess.run(
        [sys.executable, "tools/eda_report.py", "--warehouse", wh,
         "--out", out],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]

    report = open(os.path.join(out, "eda_insights_report.md")).read()
    for section in ("## Key insights", "## 1. Data quality",
                    "## 2. Supply chain overview",
                    "## 3. Financial analysis", "## 4. Inventory analysis",
                    "## 5. Correlations", "## 6. Statistical summary",
                    "## 7. Cross-layer reconciliation"):
        assert section in report, section
    assert "1. " in report.split("## Key insights")[1]
    csvs = os.listdir(os.path.join(out, "csv"))
    assert len(csvs) >= 10


def test_bench_calibration_math_and_probe(spark):
    """bench.py::_Calibration: the probe is a real bounded Spark job,
    checkpoints record median-of-3 at the tick cadence, the run
    factor is REF_SEC / median(points), and normalize scales every
    entry by that single run-level factor (per-entry neighbor
    interpolation was measured too noisy — PERFORMANCE.md r13)."""
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from bench import _Calibration

    cal = _Calibration(spark)
    cal.probe()
    assert len(cal.points) == 1 and cal.points[0][0] == 0
    assert 0.0 < cal.points[0][1] < 60.0

    # tick cadence: EVERY entries per checkpoint
    for i in range(cal.EVERY):
        cal.tick(f"q{i}")
    assert len(cal.points) == 2 and cal.points[1][0] == cal.EVERY

    # factor/normalize arithmetic on pinned synthetic points
    cal.points = [(0, 0.5), (5, 1.3), (10, 0.65)]
    assert abs(cal.factor() - _Calibration.REF_SEC / 0.65) < 1e-12
    norm = cal.normalize({"a": 2.0, "b": 0.0})
    f = _Calibration.REF_SEC / 0.65
    assert norm == {"a": round(2.0 * f, 3), "b": 0.0}
    # empty points -> identity factor (no probe data, no correction)
    cal.points = []
    assert cal.factor() == 1.0


def test_bench_burst_guard_selection(tmp_path):
    """bench.py burst guard (VERDICT r13 #1): entries whose main-pass
    min exceeds BURST_X x the prior round's committed min are selected
    for one end-of-run retry; absent/zero/new entries never are."""
    import json as _json
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from bench import BURST_X, burst_candidates, load_prior_mins

    detail = tmp_path / "BENCH_DETAIL.json"
    detail.write_text(_json.dumps({
        "reps": {"a": [1.0, 0.9, 1.1], "b": [2.0, 2.2],
                 "zero": [0.0], "empty": []}}))
    prior = load_prior_mins(str(detail))
    assert prior == {"a": 0.9, "b": 2.0, "zero": 0.0}

    timings = {"a": 0.9 * BURST_X + 0.01,   # burst -> retry
               "b": 2.0 * BURST_X,           # exactly at bound -> no
               "zero": 5.0,                  # prior 0 -> never
               "new_entry": 9.9}             # no prior -> never
    assert burst_candidates(timings, prior) == ["a"]
    # threshold is parameterizable (the 2.5-3x band from the brief)
    assert burst_candidates(timings, prior, burst_x=3.0) == []
    # unreadable/missing detail file -> no priors -> no retries
    assert load_prior_mins(str(tmp_path / "nope.json")) == {}
    assert burst_candidates(timings, {}) == []


def test_bench_prior_detail_archive_resolution(tmp_path):
    """bench.py per-round detail archive (VERDICT r14 #4): prior-min
    and normalized-pair loading resolve to the newest committed
    docs/bench_history/BENCH_DETAIL_r{N}.json, falling back to the
    rotating BENCH_DETAIL.json when no archive matches — so the
    cross-round pair survives same-round bench reruns."""
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from bench import prior_detail_path, prior_round_n

    here = str(tmp_path)
    assert prior_round_n(here) is None
    assert prior_detail_path(here) == f"{here}/BENCH_DETAIL.json"

    (tmp_path / "BENCH_r3.json").write_text("{}")
    (tmp_path / "BENCH_r12.json").write_text("{}")
    (tmp_path / "BENCH_rX.json").write_text("{}")  # non-numeric: skip
    assert prior_round_n(here) == 12
    # archive absent for r12 -> fallback to the rotating file
    assert prior_detail_path(here) == f"{here}/BENCH_DETAIL.json"
    hist = tmp_path / "docs" / "bench_history"
    hist.mkdir(parents=True)
    (hist / "BENCH_DETAIL_r12.json").write_text("{}")
    assert prior_detail_path(here) == str(hist / "BENCH_DETAIL_r12.json")
