"""URL canonicalization for crawl ingest — native expressions only.

Real crawls key on URL, not doc_id: the same page arrives as
``HTTP://Example.COM:80/a/?utm_source=x&b=2#frag`` and
``http://example.com/a?b=2``. Canonicalization rules (the standard
crawl-frontier set — scheme/host case, default ports, fragments,
tracking params, trailing slashes, query-param order):

1. trim; strip the ``#fragment``.
2. If the value has no ``scheme://`` prefix it is returned as-is
   after step 1 (non-URL strings pass through unmangled).
3. lowercase scheme and host; drop ``:80`` for http / ``:443`` for
   https (other explicit ports are kept — they are load-bearing).
4. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``,
   ``ref``); SORT the survivors (param order is not semantic);
   drop empty params (``a=1&&b=2``).
5. collapse trailing slashes on the path; empty path -> ``/``.

Userinfo (``user:pass@host``) is intentionally NOT special-cased:
crawl URLs carrying credentials should be rejected upstream, and
percent-encoding is preserved byte-for-byte (decoding it is lossy
without charset knowledge).

Every rule is a JVM-side regex/array expression (zero UDFs), and each
has a DuckDB dual built from the SAME constants (``CANONICAL_SQL`` /
``HOST_SQL``) so the gated query's oracle replays canonicalization
bit-for-bit — the regexes avoid every Java/RE2 dialect divergence
(plain character classes, anchors, no lookaround).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query params that never identify content (dropped before dedup)
TRACKING_PARAM_RE = "^(utm_[a-z0-9_]*|gclid|fbclid|ref)="

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOSTPORT_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"


def _defrag(url: Column) -> Column:
    return F.regexp_replace(F.trim(url), "#.*$", "")


def canonical_url_parts(url: Column) -> dict[str, Column]:
    """The staged canonicalization pieces. Callers should materialize
    these via withColumn (see :func:`with_canonical_url`) rather than
    nesting — each part references earlier ones, and inlining
    re-evaluates the shared regexes per reference site."""
    s = _defrag(url)
    scheme = F.lower(F.regexp_extract(s, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(s, _HOSTPORT_RE, 1))
    return {"_defragged": s, "_scheme": scheme, "_hostport": hostport}


def with_canonical_url(df: DataFrame, url_col: str,
                       out_col: str = "canonical_url",
                       host_col: str | None = "url_host") -> DataFrame:
    """Add ``out_col`` (the canonical form) and optionally ``host_col``
    (the bare lowercased host, for per-host budget caps) — staged
    withColumn pipeline, all codegen'd expressions."""
    parts = canonical_url_parts(F.col(url_col))
    df = df.withColumns(parts)
    s, scheme, hostport = (F.col("_defragged"), F.col("_scheme"),
                           F.col("_hostport"))

    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, F.lit(1), F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, F.lit(1), F.length(hostport) - 4),
    ).otherwise(hostport)

    # path+query = everything after scheme://hostport
    pathq = F.substring(
        s, F.length(scheme) + F.length(hostport) + F.lit(4),
        F.length(s))
    rawpath = F.regexp_replace(pathq, r"\?.*$", "")
    path0 = F.regexp_replace(rawpath, "/+$", "")
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)

    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(TRACKING_PARAM_RE)))
    qs = F.array_join(params, "&")

    assembled = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)))
    df = df.withColumn(
        out_col, F.when(scheme == "", s).otherwise(assembled))
    if host_col:
        df = df.withColumn(
            host_col, F.regexp_replace(host, ":[0-9]+$", ""))
    return df.drop("_defragged", "_scheme", "_hostport")


# ---------------------------------------------------------------------------
# DuckDB duals — built from the same constants, so the gated query's
# oracle replays every rule.
# ---------------------------------------------------------------------------

def _canonical_sql_body(s: str) -> str:
    scheme = f"lower(regexp_extract({s}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({s}, '{_HOSTPORT_RE}', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' AND {hostport} LIKE '%:80' "
        f"THEN substr({hostport}, 1, length({hostport}) - 3) "
        f"WHEN {scheme} = 'https' AND {hostport} LIKE '%:443' "
        f"THEN substr({hostport}, 1, length({hostport}) - 4) "
        f"ELSE {hostport} END")
    pathq = f"substr({s}, length({scheme}) + length({hostport}) + 4)"
    path0 = f"regexp_replace(regexp_replace({pathq}, '\\?.*$', ''), '/+$', '')"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    query = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    # COALESCE: DuckDB's array_to_string of an EMPTY list is NULL
    # (Spark's array_join is ''), and the NULL would otherwise
    # propagate through the assembly concat
    qs = (
        "coalesce(array_to_string(list_sort(list_filter(string_split("
        f"{query}, '&'), p -> p <> '' AND NOT "
        f"regexp_matches(lower(p), '{TRACKING_PARAM_RE}'))), '&'), '')")
    assembled = (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END")
    return f"CASE WHEN {scheme} = '' THEN {s} ELSE {assembled} END"


def canonical_url_sql(col: str) -> str:
    """DuckDB dual of the with_canonical_url output column."""
    s = f"regexp_replace(trim({col}), '#.*$', '')"
    return _canonical_sql_body(s)


def url_host_sql(col: str) -> str:
    """DuckDB dual of the url_host column."""
    s = f"regexp_replace(trim({col}), '#.*$', '')"
    scheme = f"lower(regexp_extract({s}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({s}, '{_HOSTPORT_RE}', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' AND {hostport} LIKE '%:80' "
        f"THEN substr({hostport}, 1, length({hostport}) - 3) "
        f"WHEN {scheme} = 'https' AND {hostport} LIKE '%:443' "
        f"THEN substr({hostport}, 1, length({hostport}) - 4) "
        f"ELSE {hostport} END")
    return f"regexp_replace({host}, ':[0-9]+$', '')"
