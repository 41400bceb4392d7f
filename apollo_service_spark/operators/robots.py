"""robots.txt gating as a single broadcast join per host partition.

Reference semantics (`apollo.py:258-264`): a URL is excluded when its host has
a robots rule whose non-empty Disallow path is a string prefix of the URL
path. The reference line-scans a cached robots body per URL under a lock; here
the rules are pre-aggregated to one array row per host, broadcast, and applied
with an ``exists`` lambda — one broadcast hash join, zero extra shuffles, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Raw robots.txt bodies → DISTINCT ``(host, disallow_prefix)`` rules.

    Reproduces the reference's line scan EXACTLY (`apollo.py:260-264`),
    including its deliberate crudeness — these are semantics, not bugs to
    fix, because the gate matches the reference's blocked set:

    * lines come from ``body.split('\\n')`` (a CRLF body leaves a trailing
      ``\\r`` on each line, removed by the strip below);
    * only lines where ``line.startswith('Disallow:')`` count — exact case,
      NO leading-whitespace tolerance, and NO User-agent scoping (every
      ``Disallow:`` line in the file applies to this crawler);
    * the prefix is ``line.split(':', 1)[1].strip()`` — everything after
      the FIRST colon (which ``startswith`` pins at offset 9), whitespace-
      stripped; empty prefixes are dropped (they'd block nothing anyway
      since ``path.startswith('')`` is True but the reference guards on
      truthiness first).

    All Catalyst: split → explode → startswith filter → substring + regexp
    trim — no Python in the path. The trim is ASCII ``\\s`` on both engines
    (same documented scoping as the PII patterns' ``\\b`` caveat; robots
    bodies are ASCII in practice). Output feeds :func:`aggregate_rules` →
    :func:`robots_allow` unchanged, replacing the pre-parsed rules table
    with a per-host text column fetched like any other page.
    """
    line = F.explode(F.split(F.col(body_col), "\n")).alias("line")
    prefix = F.regexp_replace(
        F.expr("substring(line, 10)"), r"^\s+|\s+$", ""
    ).alias("disallow_prefix")
    return (
        bodies.select(F.col(host_col).alias("host"), line)
        .filter(F.col("line").startswith("Disallow:"))
        .select("host", prefix)
        .filter(F.col("disallow_prefix") != "")
        .distinct()
    )


def parse_crawl_delays(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Raw robots.txt bodies → ``(host, crawl_delay double)``.

    ``Crawl-delay`` is the de-facto robots extension the reference ignores
    entirely (apollo.py's scan only looks at ``Disallow:``); this engine
    parses it so politeness budgets can come from the crawled site itself
    (see :func:`..politeness.budgets_from_delays`). Contract (ours, since
    no reference semantics exist — the public de-facto rules):

    * the directive match is CASE-INSENSITIVE (real-world files use
      ``Crawl-delay`` / ``crawl-delay`` / ``Crawl-Delay`` freely), unlike
      the reference's deliberately exact ``Disallow:`` scan;
    * the value is everything after the first colon (fixed at offset 12),
      whitespace-trimmed, parsed with ``try_cast`` → non-numeric or ≤ 0
      values are ignored, never an error;
    * multiple valid values for a host collapse to the MINIMUM — the most
      conservative (slowest) delay wins, the safe merge when a host's
      bodies disagree across fetches.

    All Catalyst: split/explode/filter/try_cast/groupBy-min — one shuffle
    on ``host``, combinable map-side.
    """
    line = F.explode(F.split(F.col(body_col), "\n")).alias("line")
    raw = F.regexp_replace(F.expr("substring(line, 13)"), r"^\s+|\s+$", "")
    delay = raw.try_cast("double")
    return (
        bodies.select(F.col(host_col).alias("host"), line)
        .filter(F.lower(F.col("line")).startswith("crawl-delay:"))
        .select("host", delay.alias("d"))
        .filter(F.col("d").isNotNull() & (F.col("d") > 0))
        .groupBy("host")
        .agg(F.min("d").alias("crawl_delay"))
    )


def parse_sitemap_directives(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Raw robots.txt bodies → DISTINCT ``(host, sitemap_url)``.

    ``Sitemap:`` is how sitemaps are discovered in practice (sitemaps.org
    protocol; global in the file, not user-agent-scoped). Same de-facto
    contract as :func:`parse_crawl_delays`: case-insensitive directive,
    value = everything after the first colon (offset 8) whitespace-trimmed
    — which preserves the ``https://`` in the value, since the split colon
    is the directive's own — kept only when absolute http(s). Feeds
    :func:`..sitemap.parse_sitemap_locs` via the ordinary fetch join.
    """
    line = F.explode(F.split(F.col(body_col), "\n")).alias("line")
    url = F.regexp_replace(F.expr("substring(line, 9)"), r"^\s+|\s+$", "")
    return (
        bodies.select(F.col(host_col).alias("host"), line)
        .filter(F.lower(F.col("line")).startswith("sitemap:"))
        .select("host", url.alias("sitemap_url"))
        .filter(
            F.col("sitemap_url").startswith("http://")
            | F.col("sitemap_url").startswith("https://")
        )
        .distinct()
    )


def parse_robots_py(body: str) -> list:
    """Python mirror of the reference loop (apollo.py:260-264) for tests."""
    out = []
    for line in (body or "").split("\n"):
        if line.startswith("Disallow:"):
            p = line.split(":", 1)[1].strip()
            if p:
                out.append(p)
    return sorted(set(out))


def aggregate_rules(robots: DataFrame) -> DataFrame:
    """(host, disallow_prefix) rows → (host, disallow_prefixes array)."""
    return (
        robots.filter(F.col("disallow_prefix").isNotNull() & (F.col("disallow_prefix") != ""))
        .groupBy("host")
        .agg(F.sort_array(F.collect_set("disallow_prefix")).alias("disallow_prefixes"))
    )


def robots_allow(
    links: DataFrame, robots_agg: DataFrame | None, path_col: str = "path"
) -> DataFrame:
    """Keep only links whose path matches no disallow prefix of their host."""
    if robots_agg is None:
        return links
    joined = links.join(F.broadcast(robots_agg), "host", "left")
    blocked = F.when(
        F.col("disallow_prefixes").isNotNull(),
        F.exists(
            F.col("disallow_prefixes"),
            lambda p: F.col(path_col).startswith(p),
        ),
    ).otherwise(F.lit(False))
    return joined.filter(~blocked).drop("disallow_prefixes")


def robots_allow_py(path: str, prefixes: list | None) -> bool:
    """Python mirror for the oracle simulator."""
    if not prefixes:
        return True
    return not any(p and path.startswith(p) for p in prefixes)
