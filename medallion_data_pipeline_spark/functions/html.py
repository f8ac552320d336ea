"""HTML -> text extraction for crawl ingest — native expressions only.

The step between the JSONL crawl shard (sources/jsonl.py) and the text
quality/dedup tier: strip markup, keep the prose, surface the title
and outlinks (which feed functions/urls.py's canonicalizer and the
crawl frontier). Deliberately regex-grade, like the reference
extractors in production crawl pipelines' first pass — not a DOM
parser: no entity table beyond the common named set, no numeric
&#NN; decoding (needs a compute-in-replacement callback no engine's
regexp_replace has), no script-aware nesting. Every rule is a
JVM-side regex expression with a DuckDB dual built from the same
pattern constants, so the gated query's oracle replays extraction
bit-for-bit (patterns use inline (?is) flags and non-greedy
quantifiers — supported identically by Java regex and RE2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: script/style/title blocks go first — their CONTENT is not body
#: prose and may itself contain markup-looking strings. One pattern
#: PER tag name (not an alternation with a backreference close tag:
#: RE2 has no backreferences, and '<script>..</style>' cross-matching
#: via a plain alternation would eat prose between mismatched blocks).
BLOCK_TAGS = ("script", "style", "title")
BLOCK_RES = tuple(f"(?is)<{t}[^>]*>.*?</{t}>" for t in BLOCK_TAGS)
TITLE_RE = "(?is)<title[^>]*>(.*?)</title>"
HREF_RE = '(?i)href="([^"]*)"'
TAG_RE = "<[^>]+>"
COMMENT_RE = "(?s)<!--.*?-->"

#: common named entities, decoded in this order (&amp; LAST — the
#: single-pass convention, so '&amp;lt;' decodes to the literal '&lt;')
ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
            ("&amp;", "&")]


def html_title(col: Column) -> Column:
    return F.trim(F.regexp_extract(col, TITLE_RE, 1))


def html_links(col: Column) -> Column:
    """All href targets, document order — feed each through
    functions/urls.py before touching the frontier."""
    return F.regexp_extract_all(col, F.lit(HREF_RE), 1)


def html_to_text(col: Column) -> Column:
    """Markup-stripped prose: comments and script/style blocks out,
    tags to spaces, named entities decoded, whitespace collapsed."""
    s = F.regexp_replace(col, COMMENT_RE, " ")
    for pat in BLOCK_RES:
        s = F.regexp_replace(s, pat, " ")
    s = F.regexp_replace(s, TAG_RE, " ")
    for ent, ch in ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def with_html_extraction(df: DataFrame, html_col: str) -> DataFrame:
    """Add title / text / links columns extracted from ``html_col`` —
    map-only, all codegen'd expressions."""
    c = F.col(html_col)
    return (df.withColumn("title", html_title(c))
            .withColumn("text_extracted", html_to_text(c))
            .withColumn("links", html_links(c)))


# ---------------------------------------------------------------------------
# DuckDB duals (same constants).
# ---------------------------------------------------------------------------

def html_title_sql(col: str) -> str:
    return f"trim(regexp_extract({col}, '{TITLE_RE}', 1))"


def html_links_sql(col: str) -> str:
    return f"regexp_extract_all({col}, '{HREF_RE}', 1)"


def html_to_text_sql(col: str) -> str:
    s = f"regexp_replace({col}, '{COMMENT_RE}', ' ', 'g')"
    for pat in BLOCK_RES:
        s = f"regexp_replace({s}, '{pat}', ' ', 'g')"
    s = f"regexp_replace({s}, '{TAG_RE}', ' ', 'g')"
    for ent, ch in ENTITIES:
        lit = ch.replace("'", "''")
        s = f"replace({s}, '{ent.replace(chr(39), chr(39) * 2)}', '{lit}')"
    return f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"
