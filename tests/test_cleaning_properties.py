"""Property-based tests (hypothesis) for the cleaning library.

Strategy: generate a BATCH of arbitrary strings per example and push it
through ONE Spark job (createDataFrame + select), asserting invariants
vectorized — a per-row Spark job per hypothesis example would take
minutes. max_examples kept small; each example covers ~30 rows.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from medallion_data_pipeline_spark.functions import cleaning as C

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

text_batch = st.lists(
    st.one_of(
        st.text(max_size=40),
        st.sampled_from(["NULL", "N/A", "TBD", "", "  ", "$1,234.56", "-42",
                         "03/14/2025", "2025-03-14", "1e10", "+",  "."]),
    ),
    min_size=1, max_size=30,
)


def _clean(spark, values, fn):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r.out for r in df.select(fn(F.col("raw")).alias("out")).collect()]


@given(values=text_batch)
@settings(**_SETTINGS)
def test_numeric_never_negative_and_rounded(spark, values):
    out = _clean(spark, values, C.clean_numeric_field)
    for v in out:
        if v is not None:
            assert v >= 0.0
            assert round(v, 4) == v


@given(values=text_batch)
@settings(**_SETTINGS)
def test_integer_always_nonnegative(spark, values):
    # the reference's sign-drop quirk implies the result is never negative
    out = _clean(spark, values, C.clean_integer_field)
    assert all(v is None or v >= 0 for v in out)


@given(values=text_batch)
@settings(**_SETTINGS)
def test_text_clean_never_empty_string(spark, values):
    out = _clean(spark, values, C.clean_text_field)
    for v in out:
        assert v is None or (v == v.strip() and v != "")


@given(values=text_batch)
@settings(**_SETTINGS)
def test_status_always_lowercase_nonnull(spark, values):
    out = _clean(spark, values, lambda c: C.clean_status_field(c, C.ORDER_STATUS_MAP))
    for v in out:
        assert v is not None and v == v.lower()


@given(dates=st.lists(st.dates(min_value=datetime.date(1990, 1, 1),
                               max_value=datetime.date(2035, 12, 31)),
                      min_size=1, max_size=20),
       fmt=st.sampled_from(["%Y-%m-%d", "%m/%d/%Y", "%d-%m-%Y", "%Y/%m/%d"]))
@settings(**_SETTINGS)
def test_date_roundtrip_all_formats(spark, dates, fmt):
    values = [d.strftime(fmt) for d in dates]
    out = _clean(spark, values, C.clean_date_field)
    for d, parsed in zip(dates, out):
        if fmt == "%d-%m-%Y" and d.day <= 12:
            # ambiguous day/month under earlier-precedence formats may
            # legitimately parse as a different valid date — only assert
            # parseability, not identity (reference has the same property)
            assert parsed is not None
        else:
            assert parsed == d
