"""robots.txt parsing and URL access evaluation (RFC 9309).

Reference scope: samzong/prom-etl-db has no web surface; this is a
§2.E training-data-pipeline extension (round 6) — a crawl-curation
corpus must honor robots exclusion before a page may enter the corpus
at all, making this the gate IN FRONT of the whole existing web arc
(url_canonicalize → url_dedup → host PageRank). RFC 9309 (the Robots
Exclusion Protocol, published 2022) is the public spec implemented.

Semantics implemented (RFC 9309 §2):
- Groups: consecutive ``User-agent`` lines open one group; the
  access rules that follow belong to every agent named in that run.
- Group selection: a crawler obeys the MOST SPECIFIC matching group
  only — all groups naming its product token if any exist, else the
  ``*`` groups (never both).
- Rule matching: patterns are byte-prefix matches against the URL
  path+query, with ``*`` matching any substring and a trailing ``$``
  anchoring the end. Of all matching rules the LONGEST pattern wins;
  on a length tie ``Allow`` wins. No matching rule ⇒ allowed.
- An empty ``Disallow:`` value matches nothing (allows everything);
  unknown directives (``Crawl-delay`` etc.) and comments are ignored.

Divergence (documented in DIVERGENCES.md): RFC 9309 §2.2.2 also
requires percent-encoding-equivalent comparison; here patterns and
paths are compared as-is — the repo's composition answer is to run
both through ``urlnorm.canonicalize_url`` first, which performs the
RFC 3986 percent-normalization once for every consumer.

Spark shape — ENTIRELY pure Column expressions, no Python in the data
path: the parse is split/posexplode + regexp_extract with a per-host
running-sum window to assign group ids (windows are per-host and
robots files are small — bounded state); matching is a LIKE-translated
equi-join on host + one hash aggregation taking ``max(struct(len,
is_allow, pattern))`` so the RFC's longest-match/allow-ties ordering
is a single struct comparison. Whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: directive-line shape: optional whitespace, a known directive name
#: (case-insensitive), ':', value up to an optional comment.
_DIRECTIVE_RE = r"(?i)^\s*(user-agent|allow|disallow)\s*:\s*([^#]*?)\s*(?:#.*)?$"


def like_pattern(pattern: Column) -> Column:
    """Translate a robots rule pattern into a SQL ``LIKE`` pattern
    (backslash escape): literal ``\\ % _`` are escaped, ``*`` becomes
    ``%``, a trailing ``$`` anchors (no trailing ``%`` appended).
    Kept public so the DuckDB oracle states the exact same translation
    as a closed form (same replace chain, same trailing-$ branch)."""
    esc = F.replace(
        F.replace(
            F.replace(pattern, F.lit("\\"), F.lit("\\\\")),
            F.lit("%"),
            F.lit("\\%"),
        ),
        F.lit("_"),
        F.lit("\\_"),
    )
    star = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(
        star.endswith("$"), star.substr(F.lit(1), F.length(star) - 1)
    ).otherwise(F.concat(star, F.lit("%")))


def _grouped_directives(
    robots: DataFrame, key_col: str, text_col: str, directive_re: str
) -> tuple[DataFrame, DataFrame]:
    """Shared group machinery: split lines, extract directives matching
    ``directive_re``, assign group ids by User-agent runs. Returns
    (agents(key, grp, agent), rules(key, grp, field, value))."""
    lines = robots.select(
        key_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).select(
        key_col,
        "pos",
        F.lower(F.regexp_extract("line", directive_re, 1)).alias("field"),
        F.regexp_extract("line", directive_re, 2).alias("value"),
    ).where(F.col("field") != "")
    # two selects: lag and the running sum are both window functions and
    # Spark forbids nesting one inside the other's argument
    w = Window.partitionBy(key_col).orderBy("pos")
    starts = lines.select(
        key_col,
        "pos",
        "field",
        "value",
        (
            (F.col("field") == "user-agent")
            & (F.coalesce(F.lag("field").over(w), F.lit("")) != "user-agent")
        ).cast("int").alias("is_start"),
    )
    grouped = starts.select(
        key_col, "pos", "field", "value", F.sum("is_start").over(w).alias("grp")
    )
    agents = (
        grouped.where(F.col("field") == "user-agent")
        .select(key_col, "grp", F.lower("value").alias("agent"))
        .distinct()
    )
    rules = grouped.where(F.col("field") != "user-agent").select(
        key_col, "grp", "field", "value"
    )
    return agents, rules


def parse_robots(
    robots: DataFrame, *, key_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """Parse one robots.txt per key row into access rules.

    Output: ``(key_col, agent, is_allow boolean, pattern, pattern_len)``
    — one row per (agent in group) × (rule in group). Rules in a group
    with no ``User-agent`` header (malformed leading rules) are dropped,
    as are empty-pattern rules (RFC: match nothing) — but a group whose
    rules ALL vanish still emits one membership row per agent with NULL
    ``is_allow``/``pattern`` (pattern_len 0): RFC 9309 group selection
    keys on which groups NAME the agent, so the common
    ``User-agent: mybot / Disallow:`` allow-everything idiom must still
    suppress the ``*`` fallback for mybot (see select_group).
    """
    agents, rules = _grouped_directives(robots, key_col, text_col, _DIRECTIVE_RE)
    rules = rules.where(F.col("value") != "").select(
        key_col,
        "grp",
        (F.col("field") == "allow").alias("is_allow"),
        F.col("value").alias("pattern"),
        F.length("value").alias("pattern_len"),
    )
    return (
        agents.join(rules, [key_col, "grp"], "left")
        .drop("grp")
        .withColumn("pattern_len", F.coalesce("pattern_len", F.lit(0)))
    )


def select_group(
    rules: DataFrame, agent: str, *, key_col: str = "host"
) -> DataFrame:
    """RFC 9309 group selection: per key, the rules for ``agent`` if any
    group NAMES it (even a group whose only rule is an empty
    ``Disallow:`` — parse_robots keeps such membership as a NULL-pattern
    row), else the ``*`` rules — never both. NULL-pattern membership
    rows are consumed here and never returned."""
    agent = agent.lower()
    mine = rules.where(F.col("agent") == agent)
    keys_with_mine = mine.select(key_col).distinct()
    fallback = rules.where(F.col("agent") == "*").join(
        keys_with_mine, key_col, "left_anti"
    )
    return (
        mine.unionByName(fallback)
        .where(F.col("pattern").isNotNull())
        .drop("agent")
    )


def robots_allowed(
    urls: DataFrame,
    robots: DataFrame,
    *,
    agent: str,
    key_col: str = "host",
    url_col: str = "url_path",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Evaluate every URL row against its host's robots.txt for
    ``agent``. ``url_col`` is the path+query string (RFC 9309 matches
    on the path with optional query, never scheme/host).

    Output: the ``urls`` columns plus ``allowed`` (boolean),
    ``matched_pattern`` (decisive rule, '' if none) and ``matched_len``
    (its length, 0 if none). Decisive = longest match, Allow on ties,
    then lexicographically-greatest pattern as a deterministic final
    tiebreak (RFC leaves equal-length-equal-verdict ties unspecified).
    """
    # r12 single-pass shape: the old plan joined urls against the
    # per-rule frame (fan-out: one row per url × matching-host rule),
    # aggregated the winner per (host, url), and LEFT-JOINED BACK to
    # urls — so the urls subtree (in crawl_pipeline_v1: the whole WARC
    # byte-walk MapInPandas) executed twice and the verdict cost three
    # shuffles. A robots.txt is small (rules per host are bounded by
    # the file the server publishes), so the rules COLLAPSE to one
    # array row per host; one broadcast-class left join attaches them
    # and the RFC's longest-match/allow-ties winner is the array_max
    # of the LIKE-matching rules — same struct ordering as the old
    # max(struct(l, a, p)), zero extra scans of urls, zero fan-out.
    selected = select_group(
        parse_robots(robots, key_col=key_col, text_col=text_col), agent,
        key_col=key_col,
    ).withColumn("lp", like_pattern(F.col("pattern")))
    rules_by_key = selected.groupBy(key_col).agg(
        F.collect_list(
            F.struct(
                F.col("pattern_len").alias("l"),
                F.col("is_allow").alias("a"),
                F.col("pattern").alias("p"),
                F.col("lp").alias("lp"),
            )
        ).alias("__rules")
    )
    win = F.array_max(
        F.filter(
            F.col("__rules"),
            lambda r: F.like(F.col(url_col), r["lp"], F.lit("\\")),
        )
    )
    return (
        # no broadcast hint: one array row per host is broadcast-class
        # for any real fleet's config slice, but a web-scale host list
        # is not — AQE picks the strategy from the measured size
        urls.join(rules_by_key, key_col, "left")
        .withColumn("__win", win)
        .withColumn("allowed", F.coalesce(F.col("__win")["a"], F.lit(True)))
        .withColumn(
            "matched_pattern", F.coalesce(F.col("__win")["p"], F.lit(""))
        )
        .withColumn(
            "matched_len", F.coalesce(F.col("__win")["l"], F.lit(0))
        )
        .drop("__rules", "__win")
    )


def sitemap_directives(
    robots: DataFrame, *, key_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """``Sitemap:`` lines of each robots.txt (RFC 9309 §2.2.4 treats
    them as extension lines; they are group-INDEPENDENT, so every line
    applies regardless of user-agent). Output: (key_col, sitemap_url)
    — the discovery hand-off to functions/sitemap.py. Pure Column:
    split + regexp_extract, zero Python."""
    lines = robots.select(
        key_col,
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    url = F.regexp_extract(
        "line", r"(?i)^\s*sitemap\s*:\s*([^#\s]+)\s*(?:#.*)?$", 1
    )
    return lines.select(key_col, url.alias("sitemap_url")).where(
        F.col("sitemap_url") != ""
    )


#: Crawl-delay is a de-facto extension (not in RFC 9309 but honored by
#: most crawlers); it belongs to its group like access rules do. The
#: regex must keep access rules VISIBLE to the run detector — an
#: Allow/Disallow between two User-agent lines closes the first run, so
#: dropping those lines before grouping would wrongly merge two groups
#: (caught by the r7 membership-fix tests); they are filtered out only
#: AFTER group ids are assigned.
_DELAY_RE = (
    r"(?i)^\s*(user-agent|allow|disallow|crawl-delay)\s*:\s*([^#]*?)\s*(?:#.*)?$"
)


def agent_crawl_delay(
    robots: DataFrame,
    *,
    agent: str,
    key_col: str = "host",
    text_col: str = "robots_txt",
    default_delay_s: float = 0.0,
) -> DataFrame:
    """Per-host Crawl-delay for ``agent`` with RFC group selection
    (specific group beats ``*``, never both — membership keyed on which
    groups NAME the agent, so a group naming it with no usable delay
    still suppresses the ``*`` fallback and yields the default);
    multiple delay lines in scope resolve to the MINIMUM (the
    crawler-friendly reading), unparseable values fall back to
    ``default_delay_s``. Output: (key_col, delay_s double) — every
    robots host gets a row."""
    agent = agent.lower()
    agents, rules = _grouped_directives(robots, key_col, text_col, _DELAY_RE)
    delays = agents.join(
        rules.where(F.col("field") == "crawl-delay"), [key_col, "grp"]
    ).select(
        key_col, "agent", F.col("value").try_cast("double").alias("delay_s")
    ).where(F.col("delay_s").isNotNull() & (F.col("delay_s") >= 0))
    mine = delays.where(F.col("agent") == agent)
    keys_with_mine = (
        agents.where(F.col("agent") == agent).select(key_col).distinct()
    )
    fallback = delays.where(F.col("agent") == "*").join(
        keys_with_mine, key_col, "left_anti"
    )
    chosen = mine.unionByName(fallback).groupBy(key_col).agg(
        F.min("delay_s").alias("delay_s")
    )
    hosts = robots.select(key_col).distinct()
    return hosts.join(chosen, key_col, "left").select(
        key_col, F.coalesce("delay_s", F.lit(float(default_delay_s))).alias("delay_s")
    )
