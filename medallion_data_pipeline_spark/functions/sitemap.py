"""Sitemap (sitemaps.org XML) parsing for frontier seeding — native
expressions only, the html.py discipline: regex-grade extraction with
inline (?s) flags and non-greedy quantifiers that Java regex and RE2
treat identically, every pattern a shared constant so the gated
query's DuckDB oracle replays extraction bit-for-bit.

A crawl frontier seeds from two shapes:

- ``<urlset>`` files: ``<url>`` entries carrying ``<loc>`` (required;
  XML-entity-encoded — '&' in a URL arrives as '&amp;'), optional
  ``<lastmod>`` (W3C datetime; the DATE prefix is what recrawl
  scheduling uses) and ``<priority>`` (0.0-1.0).
- ``<sitemapindex>`` files: ``<sitemap><loc>`` children pointing at
  more sitemaps — surfaced separately (an index loc must be fetched,
  not crawled as a page).

Extraction is one regexp_extract_all + explode per input row (output
~ entries, the explode shape a 100 TB frontier seed wants); lastmod
parses leniently via try_to_date on the 10-char date prefix
(malformed -> NULL, never a throw); priority via try-cast to double
(the decimal literals 0.0-1.0 parse identically in both engines);
entries with no/empty loc drop. Seeded locs feed functions/urls.py's
canonicalizer before touching the frontier, exactly like page
outlinks."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .html import ENTITIES

URL_BLOCK_RE = "(?s)<url>(.*?)</url>"
INDEX_BLOCK_RE = "(?s)<sitemap>(.*?)</sitemap>"
LOC_RE = "(?s)<loc>(.*?)</loc>"
LASTMOD_RE = "(?s)<lastmod>(.*?)</lastmod>"
PRIORITY_RE = "(?s)<priority>(.*?)</priority>"


def _decode(col: Column) -> Column:
    for ent, ch in ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def sitemap_urls(df: DataFrame, host_col: str = "host",
                 xml_col: str = "sitemap_xml") -> DataFrame:
    """(host, loc, lastmod, priority) — one row per ``<url>`` entry:
    loc entity-decoded and trimmed (entries without one drop),
    lastmod the DATE prefix of the W3C datetime (NULL when absent or
    malformed), priority as double (NULL likewise)."""
    blocks = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.regexp_extract_all(F.col(xml_col),
                                       F.lit(URL_BLOCK_RE), 1))
        .alias("e"))
    loc = _decode(F.trim(F.regexp_extract("e", LOC_RE, 1)))
    lastmod = F.try_to_date(
        F.substring(F.trim(F.regexp_extract("e", LASTMOD_RE, 1)), 1, 10),
        "yyyy-MM-dd")
    prio = F.expr(
        f"try_cast(trim(regexp_extract(e, '{PRIORITY_RE}', 1)) "
        f"AS DOUBLE)")
    return (blocks.select("host", loc.alias("loc"),
                          lastmod.alias("lastmod"),
                          prio.alias("priority"))
            .filter(F.length("loc") > 0))


def sitemap_index_locs(df: DataFrame, host_col: str = "host",
                       xml_col: str = "sitemap_xml") -> DataFrame:
    """(host, sitemap_loc) — ``<sitemapindex>`` children: the NEXT
    sitemaps to fetch (never crawled as pages)."""
    blocks = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.regexp_extract_all(F.col(xml_col),
                                       F.lit(INDEX_BLOCK_RE), 1))
        .alias("e"))
    loc = _decode(F.trim(F.regexp_extract("e", LOC_RE, 1)))
    return (blocks.select("host", loc.alias("sitemap_loc"))
            .filter(F.length("sitemap_loc") > 0))


# ---------------------------------------------------------------------------
# DuckDB duals (same constants).
# ---------------------------------------------------------------------------

def _decode_sql(x: str) -> str:
    for ent, ch in ENTITIES:
        lit = ch.replace("'", "''")
        x = f"replace({x}, '{ent.replace(chr(39), chr(39) * 2)}', '{lit}')"
    return x


def sitemap_urls_sql(src: str, host_col: str = "host",
                     xml_col: str = "sitemap_xml") -> str:
    """A query fragment producing (host, loc, lastmod, priority) from
    ``src`` — the sitemap_urls dual."""
    loc = _decode_sql(f"trim(regexp_extract(e, '{LOC_RE}', 1))")
    lastmod = (f"TRY_CAST(substr(trim(regexp_extract(e, "
               f"'{LASTMOD_RE}', 1)), 1, 10) AS DATE)")
    prio = (f"TRY_CAST(trim(regexp_extract(e, '{PRIORITY_RE}', 1)) "
            f"AS DOUBLE)")
    return f"""
SELECT host, loc, lastmod, priority FROM (
    SELECT {host_col} AS host,
           {loc} AS loc, {lastmod} AS lastmod, {prio} AS priority
    FROM (
        SELECT {host_col}, unnest(regexp_extract_all({xml_col},
               '{URL_BLOCK_RE}', 1)) AS e
        FROM {src})
) WHERE length(loc) > 0
"""
