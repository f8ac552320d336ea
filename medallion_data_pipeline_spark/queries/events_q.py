"""Event-stream queries over the ``events`` table — the batch duals of
the Structured Streaming operators in streaming/events.py (SURVEY §2.8:
the reference is batch-only; streaming is the engine's green-field
extension, so these queries define the semantics the streaming variant
must match on the same data).

Determinism: timestamps are compared/bucketed via epoch milliseconds
(exact integers in both engines); money-ish ``value`` sums go through
DECIMAL(12,2).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import register
from ._util import dsum, fdiv, sql_fdiv, t

# ---------------------------------------------------------------------------
# q16 — frequency distribution (SURVEY A11: value_counts).
# ---------------------------------------------------------------------------

_EVENT_COUNTS_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY n_events DESC, event_type
LIMIT 10
"""


@register("event_type_counts", oracle=_EVENT_COUNTS_SQL)
def event_type_counts(spark, sf_dir):
    """Top-10 value_counts over event_type (reference
    eda/supply_chain_eda.py:378-399)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("event_type"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q17 — JSON extraction (SURVEY F20-adjacent; props is a JSON string).
# ---------------------------------------------------------------------------

_JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       {avg_k} AS avg_k
FROM events
GROUP BY event_type
""".format(avg_k=sql_fdiv("SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))", "COUNT(*)"))


@register("json_props_agg", oracle=_JSON_SQL)
def json_props_agg(spark, sf_dir):
    """get_json_object extraction + aggregation over a JSON-string
    column (the reference serializes rejected rows as JSON,
    silver_builder.py:464-469; here we also query it back)."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            fdiv(F.sum(k), F.count(F.lit(1))).alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# q18 — tumbling-window aggregation (streaming dual: the readStream
# version uses window(ts, '1 hour') + watermark; identical buckets).
# ---------------------------------------------------------------------------

_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("events_tumbling_hour", oracle=_TUMBLING_SQL)
def events_tumbling_hour(spark, sf_dir):
    """1-hour tumbling-window counts/sums per event type — the batch
    dual of streaming/events.py::hourly_rollup."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# q19 — sessionization (SURVEY §2.8 extension; guide 'Common OLAP
# patterns'): lag + cumulative-sum session ids, 30-minute gap.
# ---------------------------------------------------------------------------

_SESSION_SQL = """
WITH marked AS (
    SELECT user_id, event_id, ts, epoch_ms(ts) AS ts_ms,
           CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                  OR lag(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
    SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM marked
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events,
       MIN(ts_ms) AS start_ms,
       MAX(ts_ms) AS end_ms,
       MAX(ts_ms) - MIN(ts_ms) AS duration_ms
FROM sessions
GROUP BY user_id, session_seq
"""


@register("sessionize_events", oracle=_SESSION_SQL, bench=True)
def sessionize_events(spark, sf_dir):
    """Sessionization: lag(ts) gap > 30 min starts a new session;
    per-session event counts and duration. Batch dual of the
    session_window streaming operator."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_ms = F.unix_millis("ts")
    marked = e.select(
        "user_id", "event_id", ts_ms.alias("ts_ms"), F.col("ts"),
        F.when(
            (ts_ms - F.lag(ts_ms).over(w) > 1800000) | F.lag("ts").over(w).isNull(), 1
        ).otherwise(0).alias("new_session"),
    )
    sessions = marked.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
            (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
        )
    )


# ---------------------------------------------------------------------------
# q — as-of join (engine extension; DuckDB's native ASOF JOIN is the
# oracle, Spark side is the union+window carry-forward plan).
# ---------------------------------------------------------------------------

_ASOF_SQL = """
WITH purchases AS (
    SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
    SELECT user_id, ts, epoch_ms(ts) AS click_ms FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.event_id,
       c.click_ms AS asof_click_ms
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("asof_last_click", oracle=_ASOF_SQL)
def asof_last_click(spark, sf_dir):
    """As-of join: for every purchase, the same user's most recent click
    at-or-before it (operators/temporal.py::asof_join — union + one
    window per key; the distributed as-of plan)."""
    from ..operators.temporal import asof_join

    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.unix_millis("ts").alias("click_ms"))
    )
    out = asof_join(purchases, clicks, key="user_id",
                    left_ts="ts", right_ts="ts", value_cols=["click_ms"])
    return out.select("user_id", "event_id", "asof_click_ms")


# ---------------------------------------------------------------------------
# q — bounded range join (bucketed equi-join plan vs the oracle's
# inequality join).
# ---------------------------------------------------------------------------

_RANGE_SQL = """
WITH errors AS (
    SELECT user_id, event_id, ts, epoch_ms(ts) AS ms
    FROM events WHERE event_type = 'error'
)
SELECT e.user_id, e.event_id,
       CAST((SELECT COUNT(*) FROM events f
             WHERE f.user_id = e.user_id
               AND epoch_ms(f.ts) > e.ms
               AND epoch_ms(f.ts) <= e.ms + 300000) AS BIGINT) AS n_following
FROM errors e
"""


@register("range_join_followups", oracle=_RANGE_SQL)
def range_join_followups(spark, sf_dir):
    """Range join: events within 5 minutes AFTER each error, per user
    (operators/temporal.py::range_join_count — time-bucketed equi-join,
    never an inequality cross join)."""
    from ..operators.temporal import range_join_count

    e = t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("user_id", "event_id", "ts")
    return range_join_count(errors, e, key="user_id", left_ts="ts", right_ts="ts",
                            window_ms=300000).select("user_id", "event_id", "n_following")


# ---------------------------------------------------------------------------
# q — salted skew join (identical results to the plain join; the salt
# only routes rows).
# ---------------------------------------------------------------------------

_SALTED_SQL = """
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


@register("skew_salted_join", oracle=_SALTED_SQL)
def skew_salted_join(spark, sf_dir):
    """Explicit skew salting (operators/skew.py): big side salted, small
    side exploded across salts; result provably identical to the
    unsalted join (the oracle runs the plain join)."""
    from ..operators.skew import salted_join

    e = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    joined = salted_join(e, c, key="user_id", n_salts=8)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# q — funnel analysis over sessions: strictly-ordered step containment
# (view -> click -> purchase within one session, each step at or after
# the previous one). Sequence analytics the flat aggregations above
# can't express; the session definition is shared with
# sessionize_events, so the two queries compose.
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH marked AS (
    SELECT user_id, event_id, event_type, ts, epoch_ms(ts) AS ts_ms,
           CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                  OR lag(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
    SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM marked
), s1 AS (
    SELECT user_id, session_seq, MIN(ts_ms) AS t1 FROM sessions
    WHERE event_type = 'view' GROUP BY 1, 2
), s2 AS (
    SELECT s.user_id, s.session_seq, MIN(s.ts_ms) AS t2
    FROM sessions s JOIN s1 USING (user_id, session_seq)
    WHERE s.event_type = 'click' AND s.ts_ms >= s1.t1 GROUP BY 1, 2
), s3 AS (
    SELECT s.user_id, s.session_seq, MIN(s.ts_ms) AS t3
    FROM sessions s JOIN s2 USING (user_id, session_seq)
    WHERE s.event_type = 'purchase' AND s.ts_ms >= s2.t2 GROUP BY 1, 2
), totals AS (
    SELECT COUNT(*) AS n_sessions
    FROM (SELECT DISTINCT user_id, session_seq FROM sessions)
)
SELECT n_sessions,
       (SELECT COUNT(*) FROM s1) AS n_view,
       (SELECT COUNT(*) FROM s2) AS n_view_click,
       (SELECT COUNT(*) FROM s3) AS n_full_funnel,
       ROUND(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
             / (SELECT COUNT(*) FROM s1), 6) AS view_to_purchase_rate
FROM totals
"""


@register("funnel_view_click_purchase", oracle=_FUNNEL_SQL)
def funnel_view_click_purchase(spark, sf_dir):
    """Session funnel view -> click -> purchase with strict ordering
    (each step's first occurrence at or after the previous step's).

    Scale shape: one window pass assigns sessions, then three
    conditional-min aggregations each shuffling on the SAME
    (user_id, session_seq) key — co-partitioned, so AQE keeps the step
    joins local; counts are driver-side scalars only at the end."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_ms = F.unix_millis("ts")
    marked = e.select(
        "user_id", "event_id", "event_type", ts_ms.alias("ts_ms"), "ts",
        F.when(
            (ts_ms - F.lag(ts_ms).over(w) > 1800000) | F.lag("ts").over(w).isNull(), 1
        ).otherwise(0).alias("new_session"),
    )
    sessions = marked.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    ).select("user_id", "session_seq", "event_type", "ts_ms")

    keys = ["user_id", "session_seq"]
    s1 = (sessions.filter(F.col("event_type") == "view")
          .groupBy(*keys).agg(F.min("ts_ms").alias("t1")))
    s2 = (sessions.filter(F.col("event_type") == "click")
          .join(s1, keys)
          .filter(F.col("ts_ms") >= F.col("t1"))
          .groupBy(*keys).agg(F.min("ts_ms").alias("t2")))
    s3 = (sessions.filter(F.col("event_type") == "purchase")
          .join(s2, keys)
          .filter(F.col("ts_ms") >= F.col("t2"))
          .groupBy(*keys).agg(F.min("ts_ms").alias("t3")))

    per_session = (
        sessions.select(*keys).distinct()
        .join(s1, keys, "left").join(s2, keys, "left").join(s3, keys, "left")
    )
    n1, n3 = F.count("t1"), F.count("t3")
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        n1.alias("n_view"),
        F.count("t2").alias("n_view_click"),
        n3.alias("n_full_funnel"),
        F.when(n1 > 0, F.round(n3.cast("double") / n1, 6))
        .alias("view_to_purchase_rate"),
    )


# ---------------------------------------------------------------------------
# q — gap fill + forward fill: the time-series resample primitive
# (date spine -> left join -> zero-fill counts, LAST_VALUE IGNORE NULLS
# carry-forward for sparse measures).
# ---------------------------------------------------------------------------

_GAP_FILL_SQL = """
WITH b AS (
    SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
    FROM events GROUP BY 1, 2
), span AS (
    SELECT min(date_trunc('hour', ts)) AS mn, max(date_trunc('hour', ts)) AS mx
    FROM events
), spine AS (
    SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM span
), grid AS (
    SELECT h, event_type FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)
), j AS (
    SELECT g.h, g.event_type,
           CAST(COALESCE(b.n, 0) AS BIGINT) AS n_events,
           ROUND(b.sv / b.n, 6) AS avg_v
    FROM grid g LEFT JOIN b ON g.h = b.h AND g.event_type = b.event_type
)
SELECT strftime(h, '%Y-%m-%d %H:00') AS hour, event_type, n_events,
       last_value(avg_v IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY h) AS ffill_avg_value
FROM j
"""


@register("events_gap_fill", oracle=_GAP_FILL_SQL)
def events_gap_fill(spark, sf_dir):
    """Hourly resample of the event stream per type: a generated date
    spine (sequence + explode) left-joined to the hourly rollup,
    counts zero-filled, sparse avg value carried forward with
    last(ignorenulls) — LAST_VALUE IGNORE NULLS parity. The spine is
    rows(hours)×types — tiny relative to events at any scale — and the
    only event-sized shuffle is the hourly pre-aggregation."""
    ev = t(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "event_type", "value")
    hourly = ev.groupBy("h", "event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sv"))
    span = ev.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = span.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("h"))
    grid = spine.crossJoin(ev.select("event_type").distinct())
    j = grid.join(hourly, ["h", "event_type"], "left").select(
        "h", "event_type",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.round(F.col("sv") / F.col("n"), 6).alias("avg_v"),
    )
    w = W.partitionBy("event_type").orderBy("h")
    return j.select(
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        "event_type", "n_events",
        F.last("avg_v", ignorenulls=True).over(w).alias("ffill_avg_value"),
    )


# ---------------------------------------------------------------------------
# q — debounce: drop events that follow the previous same-type event
# within 5 minutes (lag-based, single window pass). The digest
# certifies the exact kept set.
# ---------------------------------------------------------------------------

_DEBOUNCE_SQL = """
WITH g AS (
    SELECT event_id, event_type,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER
               (PARTITION BY event_type ORDER BY ts, event_id) AS gap
    FROM events
), k AS (
    SELECT event_id, event_type,
           CASE WHEN gap IS NULL OR gap >= 300000 THEN 1 ELSE 0 END AS kept
    FROM g
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       md5(string_agg(CASE WHEN kept = 1 THEN CAST(event_id AS VARCHAR) END,
                      ',' ORDER BY event_id)) AS kept_digest
FROM k GROUP BY event_type
"""


@register("events_debounce", oracle=_DEBOUNCE_SQL)
def events_debounce(spark, sf_dir):
    """Per-type debounce (keep an event only if ≥5 min since the
    previous same-type event): one lag window, no self-join. The
    md5 digest over the ordered kept event_ids certifies the exact
    kept SET, not just its size."""
    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    g = ev.withColumn("gap", ms - F.lag(ms).over(w))
    kept = (F.col("gap").isNull() | (F.col("gap") >= 300000)).cast("int")
    k = g.withColumn("kept", kept)
    return k.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("kept").alias("n_kept"),
        F.md5(F.concat_ws(",", F.transform(
            F.sort_array(F.collect_list(
                F.when(F.col("kept") == 1, F.col("event_id")))),
            lambda x: x.cast("string")))).alias("kept_digest"),
    )


# ---------------------------------------------------------------------------
# q — salted two-phase aggregation over the 5-hot-key event stream:
# results provably identical to the direct groupBy (the oracle IS the
# direct aggregation).
# ---------------------------------------------------------------------------

_SALTED_AGG_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(MIN(event_id) AS BIGINT) AS first_event,
       CAST(MAX(event_id) AS BIGINT) AS last_event
FROM events GROUP BY event_type
"""


@register("salted_two_phase_agg", oracle=_SALTED_AGG_SQL)
def salted_two_phase_agg(spark, sf_dir):
    """Skew-safe aggregation (operators/skew.py::salted_two_phase_agg)
    on event_type — 5 hot keys that would each land on one reducer in
    a naive plan. The oracle is the plain direct aggregation, so the
    hash match proves salting changes the route, never the result.

    WARNING (measured, docs/SCALING.md addendum 11): salting pays off
    ONLY when the phase-1 partial agg collapses state — algebraic
    aggregates (count/sum/min/max, as here) over few hot keys. On
    all-distinct state (e.g. collect_set / exact count-distinct) the
    salted plan measured a 5x PESSIMIZATION (16.1 s vs 3.16 s direct
    at sf10): the salt multiplies the shuffled state instead of
    shrinking it. For distinct-heavy skew use approx_count_distinct /
    sketches (operators/sketch.py) or AQE skew-join splitting — do not
    copy this pattern for those shapes. Guidance: operators/skew.py."""
    from ..operators.skew import salted_two_phase_agg as _sagg
    ev = t(spark, sf_dir, "events").withColumn(
        "vdec", F.col("value").cast("decimal(18,2)"))
    aggs = {
        "n_events": (lambda: F.count(F.lit(1)), F.sum),
        "total_value_dec": (lambda: F.sum("vdec"), F.sum),
        "first_event": (lambda: F.min("event_id"), F.min),
        "last_event": (lambda: F.max("event_id"), F.max),
    }
    out = _sagg(ev, ["event_type"], aggs, n_salts=8)
    return out.select(
        "event_type", "n_events",
        F.col("total_value_dec").cast("double").alias("total_value"),
        "first_event", "last_event")


# ---------------------------------------------------------------------------
# q — VARIANT semi-structured path (Spark 4): parse_json once into a
# variant column, typed variant_get extraction, aggregate. The modern
# replacement for per-access get_json_object string re-parsing.
# ---------------------------------------------------------------------------

_VARIANT_SQL = """
SELECT event_type,
       CAST(COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""


@register("variant_props_agg", oracle=_VARIANT_SQL)
def variant_props_agg(spark, sf_dir):
    """Spark 4 VARIANT: props parses ONCE into a binary variant value
    (staged column), then typed `variant_get` paths extract without
    re-tokenizing the JSON string per access — the scale answer to
    repeated get_json_object on wide semi-structured payloads
    (json_props_agg is the legacy dual on the same data)."""
    e = t(spark, sf_dir, "events").withColumn(
        "v", F.parse_json("props"))
    k = F.variant_get(F.col("v"), "$.k", "long")
    return e.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k).alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# q — sliding windows in batch: window(ts, '3 hours', '1 hour') puts
# each event in exactly 3 hourly-aligned windows; the oracle unnests
# the 3 offsets per event.
# ---------------------------------------------------------------------------

_SLIDING_SQL = """
WITH expanded AS (
    SELECT e.event_type, e.value,
           date_trunc('hour', e.ts) - (k.k * INTERVAL 1 HOUR) AS win_start
    FROM events e CROSS JOIN (SELECT unnest(range(0, 3)) AS k) k
)
SELECT strftime(win_start, '%Y-%m-%d %H:00') AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM expanded GROUP BY 1, 2
"""


@register("events_sliding_windows", oracle=_SLIDING_SQL)
def events_sliding_windows(spark, sf_dir):
    """3-hour windows sliding by 1 hour (batch F.window with slide —
    the same Expand the streaming variant uses): every event lands in
    exactly 3 windows, so the pre-shuffle row count is 3x and the agg
    stays one shuffle. Streaming dual: swap readStream in, add a
    watermark — plan unchanged."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "3 hours", "1 hour").alias("win"),
                  "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
             .alias("total_value"))
        .select(F.date_format("win.start", "yyyy-MM-dd HH:00")
                .alias("window_start"),
                "event_type", "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# q — max_by / arg_max: latest event per user without a window sort.
# Tie-safe ordering key packs (epoch_ms, event_id) into one BIGINT
# because DuckDB 1.0 arg_max lacks composite keys.
# ---------------------------------------------------------------------------

_LATEST_SQL = """
SELECT user_id,
       arg_max(event_type, epoch_ms(ts) * 1000000 + event_id) AS last_type,
       arg_max(value, epoch_ms(ts) * 1000000 + event_id) AS last_value,
       CAST(MAX(epoch_ms(ts)) AS BIGINT) AS last_ms,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


@register("latest_event_per_user", oracle=_LATEST_SQL)
def latest_event_per_user(spark, sf_dir):
    """Latest event per user via max_by (SQL arg_max): ONE hash
    aggregation instead of the window row_number + filter plan — no
    per-group sort, mergeable partials, the cheapest 'top-1 per key'
    at any scale. Ordering key packs (epoch_ms, event_id) so ties are
    impossible."""
    e = t(spark, sf_dir, "events")
    key = F.unix_millis("ts") * F.lit(1000000) + F.col("event_id")
    return e.groupBy("user_id").agg(
        F.max_by("event_type", key).alias("last_type"),
        F.max_by("value", key).alias("last_value"),
        F.max(F.unix_millis("ts")).alias("last_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# q — gaps and islands: runs of consecutive event_ids among 'click'
# events via the id - row_number() grouping trick.
# ---------------------------------------------------------------------------

_ISLANDS_SQL = """
WITH c AS (
    SELECT event_id,
           event_id - row_number() OVER (ORDER BY event_id) AS grp
    FROM events WHERE event_type = 'click'
), islands AS (
    SELECT grp, COUNT(*) AS island_len,
           CAST(MIN(event_id) AS BIGINT) AS island_start
    FROM c GROUP BY grp
)
SELECT island_len, COUNT(*) AS n_islands,
       CAST(MIN(island_start) AS BIGINT) AS first_island_start
FROM islands GROUP BY island_len
"""


#: ids per block for the distributed islands row_number — 2^20 ids/block
#: keeps the per-block partition ~1M rows (dense worst case) while the
#: block-count side frame stays ~1M rows even at 10^12 events.
_ISLANDS_BLOCK = 1 << 20


@register("event_id_islands", oracle=_ISLANDS_SQL)
def event_id_islands(spark, sf_dir):
    """Gaps-and-islands: consecutive event_id runs within the click
    stream (id - row_number() is constant per run). Histogram of
    island lengths.

    Distributed row_number via the block-offset pattern (the same scale
    path as quantile_bins_broadcast): bucket ids into fixed ranges,
    row_number WITHIN each block (partitioned window — parallel), then
    add the broadcast cumulative count of rows in all earlier blocks.
    blk ordering == event_id ordering because blocks are id ranges, so
    rn is exactly the global row_number and islands spanning block
    boundaries still share one grp value. The only unpartitioned window
    runs over the per-block counts frame — one row per 2^20-id block
    (~1M rows at 10^12 events), bounded by construction, never over
    events."""
    e = (t(spark, sf_dir, "events")
         .filter(F.col("event_type") == "click")
         .select("event_id")
         .withColumn("blk", F.floor(F.col("event_id") / _ISLANDS_BLOCK)))
    counts = e.groupBy("blk").agg(F.count(F.lit(1)).alias("cnt"))
    offsets = counts.select(
        "blk",
        F.coalesce(
            F.sum("cnt").over(
                W.orderBy("blk").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("offset"),
    )
    wl = W.partitionBy("blk").orderBy("event_id")
    c = (e.join(F.broadcast(offsets), "blk")
         .withColumn("rn", F.row_number().over(wl) + F.col("offset"))
         .withColumn("grp", F.col("event_id") - F.col("rn")))
    islands = c.groupBy("grp").agg(
        F.count(F.lit(1)).alias("island_len"),
        F.min("event_id").alias("island_start"))
    return islands.groupBy("island_len").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.min("island_start").alias("first_island_start"))


# ---------------------------------------------------------------------------
# q — width_bucket histogram of event values (DuckDB 1.0 lacks
# width_bucket; uniform buckets are exact floor arithmetic, which IS
# the definition being verified).
# ---------------------------------------------------------------------------

_HISTOGRAM_SQL = """
WITH b AS (
    SELECT CASE WHEN value < 0 THEN 0
                WHEN value >= 100 THEN 11
                ELSE CAST(FLOOR(value / 10) AS BIGINT) + 1 END AS bucket,
           value
    FROM events
)
SELECT bucket, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS bucket_value
FROM b GROUP BY bucket
"""


@register("value_histogram", oracle=_HISTOGRAM_SQL)
def value_histogram(spark, sf_dir):
    """Fixed-bucket histogram via width_bucket(value, 0, 100, 10)
    (buckets 0 and 11 are under/overflow): one scan + tiny agg; the
    oracle recomputes the bucket with the floor arithmetic that
    defines uniform width_bucket."""
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn("bucket", F.width_bucket(
            "value", F.lit(0.0), F.lit(100.0), F.lit(10)))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
             .alias("bucket_value"))
    )


# ---------------------------------------------------------------------------
# q — weekly retention cohorts: users grouped by first-seen week,
# counted by weeks-since-cohort activity (the retention triangle).
# ---------------------------------------------------------------------------

_RETENTION_SQL = """
WITH firsts AS (
    SELECT user_id,
           CAST(FLOOR(epoch_ms(MIN(ts)) / 604800000) AS BIGINT) AS cohort_wk
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id, f.cohort_wk,
           CAST(FLOOR(epoch_ms(e.ts) / 604800000) AS BIGINT) - f.cohort_wk
               AS week_n
    FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_wk, week_n, COUNT(*) AS n_users
FROM activity GROUP BY cohort_wk, week_n
"""


@register("weekly_retention_cohorts", oracle=_RETENTION_SQL)
def weekly_retention_cohorts(spark, sf_dir):
    """Retention triangle: cohort = epoch-week of a user's first event;
    each (cohort, weeks-since-cohort) cell counts distinct active
    users. Two shuffles total (per-user min, then the distinct+count
    on the small cell grain); the firsts frame is per-user — broadcast
    range at any realistic user count relative to events."""
    e = t(spark, sf_dir, "events").select(
        "user_id", (F.floor(F.unix_millis("ts") / 604800000))
        .cast("long").alias("wk"))
    firsts = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    activity = (
        e.join(firsts, "user_id")
        .select("user_id", "cohort_wk",
                (F.col("wk") - F.col("cohort_wk")).alias("week_n"))
        .distinct()
    )
    return activity.groupBy("cohort_wk", "week_n").agg(
        F.count(F.lit(1)).alias("n_users"))
