"""robots.txt compliance (RFC 9309) as distributed expressions — the
crawl-politeness stage between URL canonicalization and the frontier:
a real crawler may only fetch what each host's robots.txt allows, so
at 100 TB the allow/deny decision must be a broadcast-rule join, not
a per-URL callout.

Semantics implemented (RFC 9309, with the documented simplifications
real parsers share):

- Lines are ``directive: value`` with ``#`` comments stripped;
  directive names are case-insensitive; unknown directives
  (crawl-delay, sitemap, ...) are ignored.
- Consecutive ``user-agent`` lines form a group HEADER; the
  allow/disallow rules that follow belong to all those agents, until
  a user-agent line that follows a rule line starts a new group.
- A crawler obeys the groups whose agent token is the MOST SPECIFIC
  match for its own name: an exact (case-insensitive) agent match
  beats ``*``; if several groups tie at the chosen specificity their
  rules are combined. No matching group (or no robots.txt at all)
  means everything is allowed.
- Rule patterns match the URL's path+query by PREFIX, with ``*``
  matching any run of characters and a TRAILING ``$`` anchoring the
  end; a non-trailing ``$`` is literal. Empty patterns are dropped
  (``Disallow:`` alone = allow everything).
- Decision per URL: the matching rule with the LONGEST pattern wins;
  on equal length ``allow`` beats ``disallow``; no matching rule
  means allowed.

Scale shape: parsing is per-host string expressions + per-host
line-position windows (a robots body is KBs — the window partition is
bounded by the file, never by the corpus); the rule table is
hosts x rules rows and broadcasts into the URL join; matching is one
rlike per (url, candidate-rule) pair and the winner folds with a
partial-agg-friendly max(struct(...)), no window over URLs.

Every transformation is an exact string/integer operation with a
DuckDB dual (robots_rules_sql / robots_decisions_sql in
queries/llmops.py), so the gated query hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: regex metacharacters escaped in rule patterns — everything except
#: ``*`` (wildcard) and ``$`` (anchor), which carry robots semantics.
#: The CHARACTER CLASS is shared verbatim with the SQL dual.
_META_CLASS = r"[\\.\^\+\?\(\)\[\]\{\}\|]"


def robots_pattern_regex(pat: Column) -> Column:
    """A rule pattern -> the anchored regex both engines match with:
    escape regex metachars (except * and $), ``*`` -> ``.*``, one
    TRAILING ``$`` -> end anchor (non-trailing ``$`` is literal and
    gets escaped), prefix-anchor with ``^``."""
    body = F.when(pat.endswith("$"),
                  F.substring(pat, 1, F.length(pat) - 1)) \
        .otherwise(pat)
    esc = F.regexp_replace(body, f"({_META_CLASS})", r"\\$1")
    # non-trailing $ becomes literal (Java replacement needs \\\$ —
    # a bare $ in a replacement string is a group reference)
    esc = F.regexp_replace(esc, r"\$", "\\\\\\$")
    esc = F.regexp_replace(esc, r"\*", ".*")
    return F.when(pat.endswith("$"),
                  F.concat(F.lit("^"), esc, F.lit("$"))) \
        .otherwise(F.concat(F.lit("^"), esc))


def robots_rules(robots: DataFrame, agent: str,
                 host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """(host, pattern, is_allow, rx, plen) — the effective rule table
    for ``agent`` parsed from one robots.txt body per host. The line
    windows are per-host (bounded by the robots file, never the
    corpus); the output is hosts x rules rows and broadcasts."""
    from pyspark.sql.window import Window as W

    agent_lc = agent.lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n"))
        .alias("pos", "line"))
    # strip comments + whitespace, split directive:value
    cleaned = lines.select(
        "host", "pos",
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("l"))
    parsed = cleaned.select(
        "host", "pos",
        F.lower(F.trim(F.regexp_extract("l", "^([^:]+):", 1)))
        .alias("kind"),
        F.trim(F.regexp_extract("l", "^[^:]+:(.*)$", 1)).alias("value"))
    kept = parsed.filter(
        F.col("kind").isin("user-agent", "allow", "disallow"))

    # group assembly: a user-agent line starts a new group iff the
    # previous kept line is not a user-agent line
    w = W.partitionBy("host").orderBy("pos")
    kept = kept.withColumn("_prev", F.lag("kind").over(w))
    kept = kept.withColumn(
        "_start",
        ((F.col("kind") == "user-agent")
         & (F.coalesce(F.col("_prev"), F.lit("")) != "user-agent"))
        .cast("int"))
    kept = kept.withColumn(
        "grp", F.sum("_start").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)))

    uas = kept.filter(F.col("kind") == "user-agent").select(
        "host", "grp", F.lower(F.col("value")).alias("agent"))
    spec = uas.select(
        "host", "grp",
        F.when(F.col("agent") == agent_lc, F.lit(2))
        .when(F.col("agent") == "*", F.lit(1))
        .otherwise(F.lit(0)).alias("s")) \
        .groupBy("host", "grp").agg(F.max("s").alias("spec"))
    chosen = spec.filter(F.col("spec") > 0) \
        .groupBy("host").agg(F.max("spec").alias("cspec"))
    groups = (spec.join(chosen, "host")
              .filter(F.col("spec") == F.col("cspec"))
              .select("host", "grp"))

    rules = (kept.filter(F.col("kind").isin("allow", "disallow"))
             .join(groups, ["host", "grp"], "left_semi")
             .filter(F.length("value") > 0)
             .select("host",
                     F.col("value").alias("pattern"),
                     (F.col("kind") == "allow").alias("is_allow"))
             .dropDuplicates(["host", "pattern", "is_allow"]))
    return rules.select(
        "host", "pattern", "is_allow",
        robots_pattern_regex(F.col("pattern")).alias("rx"),
        F.length("pattern").alias("plen"))


def with_robots_decision(urls: DataFrame, robots: DataFrame,
                         agent: str = "sparkbot",
                         id_col: str = "doc_id",
                         url_col: str = "canonical_url",
                         host_col: str = "url_host") -> DataFrame:
    """(id_col, allowed, matched_rule): RFC 9309 allow/deny per URL.
    The rule table broadcasts; the winner per URL folds as one
    partial-agg max over (plen, is_allow, pattern) — longest match
    wins, allow beats disallow on ties, lexicographically-greatest
    pattern reported on full ties (decision-equal by construction).
    URLs on hosts with no robots.txt, no matching group, or no
    matching rule are allowed."""
    rules = robots_rules(robots, agent)
    path = F.regexp_replace(F.col(url_col), r"^https?://[^/]*", "")
    u = urls.select(
        F.col(id_col), F.col(host_col).alias("host"),
        F.when(F.length(path) == 0, F.lit("/")).otherwise(path)
        .alias("_path"))
    cand = (u.join(F.broadcast(rules), "host")
            .filter(F.expr("_path rlike rx")))
    best = (cand.groupBy(id_col)
            .agg(F.max(F.struct("plen", "is_allow", "pattern"))
                 .alias("w")))
    return (u.join(best, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("w.is_allow"), F.lit(True))
                    .alias("allowed"),
                    F.col("w.pattern").alias("matched_rule")))
