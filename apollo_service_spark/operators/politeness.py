"""Per-host politeness budgets as window-ranked frontier batches.

Spark realization of the reference's per-worker ``time.sleep(delay)``
politeness (`apollo.py:619-620`, `config.py:11`) and bounded worker pool: each
frontier iteration fetches at most ``budget(host)`` URLs per host; the rest
carry over to the next iteration. The ranking's ``orderBy`` is a total order
(depth, url) so the batch selection — and therefore the whole crawl ordering —
is deterministic and replayable (SURVEY.md §2.5).

The politeness table is tiny (one row per host with an explicit budget) and is
broadcast. The window shuffles on raw ``host``; the seen-store dedup groups on
the SALTED host partition id and the anti-join fallback shuffles on ``url`` —
different hash expressions, so Spark does NOT reuse one exchange across these
stages (Catalyst requires identical partitioning expressions; a pid-partitioned
frontier clusters hosts correctly but can't be *proven* clustered-by-host).
The window exchange is one shuffle of the CURRENT frontier delta per
superstep — proportional to the batch, not the accumulated crawl — which is
the property that matters at 10^10 scale. (Corrected per VERDICT r3 task #8:
the earlier exchange-reuse claim here overstated what the planner can do.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranking import global_row_number

def frontier_order():
    """Total order pinning the canonical crawl ordering."""
    return [F.col("depth").asc(), F.col("url").asc()]


def select_batch(
    frontier: DataFrame,
    politeness: DataFrame | None,
    default_budget: int,
) -> tuple:
    """Split frontier into (selected, carryover) by per-host budget.

    frontier: (url, host, depth); politeness: (host, budget).
    """
    win = Window.partitionBy("host").orderBy(*frontier_order())
    ranked = frontier.withColumn("_rank", F.row_number().over(win))
    if politeness is not None:
        ranked = ranked.join(F.broadcast(politeness), "host", "left")
        ranked = ranked.withColumn(
            "budget", F.coalesce(F.col("budget"), F.lit(default_budget))
        )
    else:
        ranked = ranked.withColumn("budget", F.lit(default_budget))
    selected = ranked.filter(F.col("_rank") <= F.col("budget")).drop("_rank", "budget")
    carryover = ranked.filter(F.col("_rank") > F.col("budget")).drop("_rank", "budget")
    return selected, carryover


def rank_within_iteration(
    selected: DataFrame, n_partitions: int = 32, cleanup: list | None = None
) -> DataFrame:
    """Canonical within-iteration fetch rank: global (depth, url) order, 1-based.

    This is the pinned, replayable realization of the reference's
    thread-nondeterministic dequeue order (SURVEY.md §7 'hard parts').
    Computed distributed (range-partition + per-partition rank + broadcast
    offsets, operators/ranking.py) — a plain ``Window.orderBy`` would funnel
    every selected URL of the iteration through one task, the superstep's
    serialization point at 10^10-frontier scale.
    """
    return global_row_number(
        selected,
        frontier_order(),
        rank_col="rank",
        n_partitions=n_partitions,
        cleanup=cleanup,
    )
