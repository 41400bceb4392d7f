"""Bloom filter unit props + frontier equivalence with the bloom path forced."""

import numpy as np

from apollo_service_spark.operators.bloom import (
    BloomFilter,
    build_bloom,
    split_by_bloom,
)


def test_bloom_no_false_negatives(spark):
    urls = [f"https://h{i % 7}.com/p{i}" for i in range(2000)]
    df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(4)
    bloom = build_bloom(df, "url", n_items=2000, fpp=0.01)

    member_df = spark.createDataFrame([(u,) for u in urls[:500]], "url string")
    definitely_new, maybe_seen = split_by_bloom(spark, member_df, "url", bloom)
    # every true member must be flagged maybe-seen (bloom cannot miss)
    assert definitely_new.count() == 0
    assert maybe_seen.count() == 500


def test_bloom_fpp_reasonable(spark):
    urls = [f"https://h/{i}" for i in range(5000)]
    df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(4)
    bloom = build_bloom(df, "url", n_items=5000, fpp=0.01)
    probe = spark.createDataFrame(
        [(f"https://other/{i}",) for i in range(5000)], "url string"
    )
    _new, maybe = split_by_bloom(spark, probe, "url", bloom)
    fp = maybe.count()
    assert fp / 5000 < 0.05  # generous bound on the 1% target


def test_bloom_local_roundtrip():
    bloom = BloomFilter.empty(1000, 0.01)
    h1 = np.arange(100, dtype=np.int64) * 2654435761
    h2 = np.arange(100, dtype=np.int64) * 40503 + 7
    bloom.add_batch(h1, h2)
    assert bloom.might_contain(h1, h2).all()


def test_frontier_equivalence_with_bloom_forced(
    spark, small_corpus, small_corpus_spark, tmp_path
):
    """Crawl equivalence must hold when every dedup goes through the bloom
    pre-filter + exact-confirm path."""
    from tests.test_frontier import _log_tuples, _run_engine, _sim_inputs

    from apollo_service_spark.operators.frontier import CrawlConfig
    from apollo_service_spark.oracle.simulator import SimConfig, simulate

    pages, seeds, robots, politeness = _sim_inputs(small_corpus)
    sim = simulate(pages, seeds, SimConfig(), robots=robots, politeness=politeness)
    _state, store = _run_engine(
        spark,
        small_corpus_spark,
        str(tmp_path / "bloomcrawl"),
        CrawlConfig(use_bloom=True, bloom_min_seen=0),
    )
    assert _log_tuples(spark, store) == {
        (r["url"], r["iteration"], r["rank"]) for r in sim.crawl_log
    }
