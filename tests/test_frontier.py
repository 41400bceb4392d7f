"""Crawl-equivalence: the Spark frontier engine must reproduce the canonical
deterministic BFS (oracle simulator) exactly — final seen set AND crawl
ordering (iteration, within-iteration rank) — BASELINE.md correctness gate 2.
"""

import pytest
from pyspark.sql import functions as F

from apollo_service_spark.operators.frontier import (
    CrawlConfig,
    FrontierEngine,
    crawl_log_df,
)
from apollo_service_spark.oracle.simulator import SimConfig, simulate
from apollo_service_spark.sources.storage import SnapshotStore


def _sim_inputs(small_corpus):
    pages = {
        row["url"]: row["html"] for _, row in small_corpus["pages"].iterrows()
    }
    seeds = list(small_corpus["seeds"]["url"])
    robots = {}
    for _, row in small_corpus["robots"].iterrows():
        robots.setdefault(row["host"], []).append(row["disallow_prefix"])
    politeness = {
        row["host"]: int(row["budget"])
        for _, row in small_corpus["politeness"].iterrows()
    }
    return pages, seeds, robots, politeness


def _run_engine(spark, small_corpus_spark, store_path, config, resume=False):
    store = SnapshotStore(store_path)
    engine = FrontierEngine(
        spark,
        small_corpus_spark["pages"],
        store,
        config,
        robots=small_corpus_spark["robots"],
        politeness=small_corpus_spark["politeness"],
    )
    state = engine.run(seeds=small_corpus_spark["seeds"], resume=resume)
    return state, store


def _log_tuples(spark, store):
    log = crawl_log_df(spark, store)
    return {
        (r["url"], r["iteration"], r["rank"])
        for r in log.select("url", "iteration", "rank").collect()
    }


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"depth_limit": 2},
        {"max_pages": 25},
        {"default_budget": 2},
    ],
    ids=["unbounded", "depth2", "maxpages25", "budget2"],
)
def test_crawl_matches_simulator(
    spark, small_corpus, small_corpus_spark, tmp_path, kwargs
):
    pages, seeds, robots, politeness = _sim_inputs(small_corpus)
    sim = simulate(
        pages,
        seeds,
        SimConfig(**kwargs),
        robots=robots,
        politeness=politeness,
    )
    state, store = _run_engine(
        spark, small_corpus_spark, str(tmp_path / "crawl"), CrawlConfig(**kwargs)
    )

    expected = {(r["url"], r["iteration"], r["rank"]) for r in sim.crawl_log}
    got = _log_tuples(spark, store)
    assert got == expected

    seen_df = store.read_accumulated(spark, "seen_delta")
    got_seen = {r["url"] for r in seen_df.collect()}
    assert got_seen == sim.seen

    assert state.pages_fetched == sim.pages_fetched
    assert state.iterations == sim.iterations
    assert state.stopped_reason == sim.stopped_reason


def test_crawl_nontrivial(spark, small_corpus, small_corpus_spark, tmp_path):
    """Guard against vacuous equivalence: the crawl must really expand."""
    pages, seeds, robots, politeness = _sim_inputs(small_corpus)
    sim = simulate(pages, seeds, SimConfig(), robots=robots, politeness=politeness)
    assert sim.iterations >= 3
    assert sim.pages_fetched > 40
    assert len(sim.seen) > 40
    # robots actually blocked something: /sec3 is disallowed on host0/host3
    from urllib.parse import urlparse

    blocked = [
        u
        for u in pages
        if urlparse(u).netloc == "host0.example.com"
        and urlparse(u).path.startswith("/sec3")
    ]
    assert blocked, "fixture should contain robots-disallowed urls"
    assert all(u not in sim.seen for u in blocked)


def test_resume_mid_frontier(spark, small_corpus, small_corpus_spark, tmp_path):
    """Kill after k iterations, resume, final state identical to one run."""
    full_cfg = CrawlConfig()
    _, store_full = _run_engine(
        spark, small_corpus_spark, str(tmp_path / "full"), full_cfg
    )

    part_cfg = CrawlConfig(max_iterations=2)
    _, store_part = _run_engine(
        spark, small_corpus_spark, str(tmp_path / "part"), part_cfg
    )
    assert store_part.latest_iteration() == 1  # iterations 0,1 committed

    resume_cfg = CrawlConfig()
    _, store_resumed = _run_engine(
        spark,
        small_corpus_spark,
        str(tmp_path / "part"),
        resume_cfg,
        resume=True,
    )

    assert _log_tuples(spark, store_resumed) == _log_tuples(spark, store_full)
    seen_a = {
        r["url"]
        for r in store_resumed.read_accumulated(spark, "seen_delta").collect()
    }
    seen_b = {
        r["url"] for r in store_full.read_accumulated(spark, "seen_delta").collect()
    }
    assert seen_a == seen_b


def test_metrics_and_lineage_recorded(spark, small_corpus_spark, tmp_path):
    _, store = _run_engine(
        spark, small_corpus_spark, str(tmp_path / "m"), CrawlConfig(max_iterations=3)
    )
    metrics = store.iteration_metrics()
    assert len(metrics) == 3
    for m in metrics:
        assert m["scheduled"] > 0
        assert "wall_s" in m
    lineage = store.read_accumulated(spark, "lineage")
    rows = lineage.collect()
    assert {r["iteration"] for r in rows} == {0, 1, 2}
    assert all(r["rows"] >= 0 for r in rows)


def test_max_links_limit(spark, small_corpus, small_corpus_spark, tmp_path):
    pages, seeds, robots, politeness = _sim_inputs(small_corpus)
    sim = simulate(
        pages, seeds, SimConfig(max_links=30), robots=robots, politeness=politeness
    )
    state, store = _run_engine(
        spark,
        small_corpus_spark,
        str(tmp_path / "ml"),
        CrawlConfig(max_links=30),
    )
    assert state.stopped_reason == sim.stopped_reason == "max_links"
    assert state.links_processed == sim.links_processed
    assert _log_tuples(spark, store) == {
        (r["url"], r["iteration"], r["rank"]) for r in sim.crawl_log
    }


def test_politeness_prune_crawl_identical(
    spark, small_corpus_spark, tmp_path
):
    """CrawlConfig.politeness_prune (two-phase batch selection for mega-host
    frontiers) must leave the whole crawl byte-identical: same log, same
    ranks, same seen set as the single-window default."""
    base_cfg = CrawlConfig()
    _, store_base = _run_engine(
        spark, small_corpus_spark, str(tmp_path / "base"), base_cfg
    )
    pruned_cfg = CrawlConfig(politeness_prune=4)
    _, store_pruned = _run_engine(
        spark, small_corpus_spark, str(tmp_path / "pruned"), pruned_cfg
    )
    assert _log_tuples(spark, store_pruned) == _log_tuples(spark, store_base)
