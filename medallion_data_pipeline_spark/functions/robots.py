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


def _robots_groups(robots: DataFrame, agent: str,
                   host_col: str = "host",
                   body_col: str = "robots_txt"):
    """Internal: (kept, groups) — the parsed directive lines with
    their group ids, and the (host, grp) set the crawler obeys for
    ``agent``. Directives kept: user-agent / allow / disallow /
    crawl-delay (crawl-delay both carries the politeness interval and
    terminates a user-agent header run, so a UA line after it starts
    a NEW group — dropping it before grouping would silently merge
    the two groups)."""
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
        F.col("kind").isin("user-agent", "allow", "disallow",
                           "crawl-delay"))

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
    return kept, groups


def robots_rules(robots: DataFrame, agent: str,
                 host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """(host, pattern, is_allow, rx, plen) — the effective rule table
    for ``agent`` parsed from one robots.txt body per host. The line
    windows are per-host (bounded by the robots file, never the
    corpus); the output is hosts x rules rows and broadcasts."""
    kept, groups = _robots_groups(robots, agent, host_col, body_col)
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


def robots_crawl_delay(robots: DataFrame, agent: str,
                       host_col: str = "host",
                       body_col: str = "robots_txt") -> DataFrame:
    """(host, crawl_delay_s) — the politeness interval the chosen
    group declares, integer seconds (the de-facto Crawl-delay
    extension; non-integer values are ignored like any malformed
    line). Several delays in the chosen groups fold conservatively to
    the MAX. Hosts with no delay are absent — callers coalesce to
    their default."""
    kept, groups = _robots_groups(robots, agent, host_col, body_col)
    return (kept.filter(F.col("kind") == "crawl-delay")
            .join(groups, ["host", "grp"], "left_semi")
            .select("host",
                    F.expr("try_cast(value AS INT)").alias("d"))
            .filter(F.col("d").isNotNull())
            .groupBy("host").agg(F.max("d").alias("crawl_delay_s")))


def fetch_schedule(urls: DataFrame, robots: DataFrame | None = None,
                   agent: str = "sparkbot",
                   default_delay_s: int = 1,
                   id_col: str = "doc_id",
                   host_col: str = "url_host") -> DataFrame:
    """(id_col, host, slot, delay_s, fetch_offset_ms) — the per-host
    politeness schedule: URLs of one host fetch one per
    ``crawl_delay_s`` seconds (the host's robots Crawl-delay, else
    ``default_delay_s``), so slot i fires at i * delay. The slot
    order within a host is a seeded md5 shuffle (politeness needs
    SPACING, not any particular order — the shuffle spreads a host's
    deep paths instead of walking them in id order).

    Scale shape: slots use the 256-block offset pattern
    (queries/llmops.py::training_order) PER HOST — row_number windows
    partition on (host, blk) so no single partition ever holds a
    whole hot host, and the per-host offset table is hosts x <=256
    rows built from a partial agg + a <=256-row window per host. The
    delay table broadcasts."""
    from pyspark.sql.window import Window as W

    u = urls.select(F.col(id_col), F.col(host_col).alias("host"))
    if robots is not None:
        delays = robots_crawl_delay(robots, agent)
        u = u.join(F.broadcast(delays), "host", "left")
    else:
        u = u.withColumn("crawl_delay_s", F.lit(None).cast("int"))
    u = u.withColumn(
        "delay_s",
        F.coalesce("crawl_delay_s", F.lit(default_delay_s)).cast("int"))

    keyed = u.withColumn(
        "_k", F.md5(F.concat(F.lit("slot:"),
                             F.col(id_col).cast("string")))) \
        .withColumn("blk", F.substring("_k", 1, 2))
    counts = keyed.groupBy("host", "blk") \
        .agg(F.count(F.lit(1)).alias("cnt"))
    offsets = counts.select(
        "host", "blk",
        F.coalesce(
            F.sum("cnt").over(
                W.partitionBy("host").orderBy("blk")
                .rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0)).alias("offset"))
    wl = W.partitionBy("host", "blk").orderBy("_k", id_col)
    return (keyed.join(offsets, ["host", "blk"])
            .withColumn("slot",
                        (F.row_number().over(wl) + F.col("offset"))
                        .cast("long"))
            .select(id_col, "host", "slot", "delay_s",
                    ((F.col("slot") - 1) * F.col("delay_s")
                     * F.lit(1000)).cast("long")
                    .alias("fetch_offset_ms")))


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
