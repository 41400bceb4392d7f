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
