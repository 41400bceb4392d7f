"""Greedy path-prefix clustering: hand-computed cases + distributed vs local."""

from urllib.parse import urlparse

from pyspark.sql import functions as F

from apollo_service_spark.functions import urlkit
from apollo_service_spark.operators.clustering import (
    cluster_summary,
    cluster_urls,
    greedy_merge_paths,
    year_clusters,
)


def test_greedy_merge_hand_case():
    paths = {"/a": ["u1"], "/a/b": ["u2", "u3"], "/c": ["u4"]}
    got = greedy_merge_paths(paths, min_cluster_size=2, similarity_threshold=0.5)
    assert got == [("/a", ["u1", "u2", "u3"])]


def test_greedy_merge_root_sentinel():
    paths = {"/": ["u1", "u2"], "/x": ["u3"]}
    got = greedy_merge_paths(paths, min_cluster_size=2, similarity_threshold=0.5)
    # "/" absorbs "/x" via similarity ≥ 0.5; common prefix of "/" and "/x" is
    # "" → falsy → pattern name "/" (reference url_clusterer.py:193-198)
    assert got == [("/", ["u1", "u2", "u3"])]
    # a root-only cluster that merges nothing keeps pattern "/" → "/[ROOT]"
    got_root = greedy_merge_paths(
        {"/": ["u1", "u2"]}, min_cluster_size=2, similarity_threshold=0.5
    )
    assert got_root == [("/[ROOT]", ["u1", "u2"])]


def test_greedy_merge_leftover_pass():
    paths = {"/aa/x": ["u1", "u2"], "/zz/y": ["u3", "u4"]}
    got = greedy_merge_paths(paths, min_cluster_size=3, similarity_threshold=0.9)
    # neither merges nor reaches size 3 in the main pass; leftovers < 3 dropped
    assert got == []
    got2 = greedy_merge_paths(paths, min_cluster_size=2, similarity_threshold=0.9)
    assert dict(got2) == {"/aa/x": ["u1", "u2"], "/zz/y": ["u3", "u4"]}


def test_cluster_urls_distributed_matches_local(spark, small_corpus):
    urls_pd = small_corpus["pages"][["url"]]
    urls = spark.createDataFrame(urls_pd, "url string")
    got = {
        (r["domain"], r["cluster_id"]): (r["path_pattern"], list(r["urls"]))
        for r in cluster_urls(urls, path_depth=2).collect()
    }

    # local oracle: same shared greedy fn, per-domain, pinned ordering
    by_domain: dict = {}
    for url in urls_pd["url"]:
        parsed = urlparse(url)
        domain = parsed.netloc
        path = urlkit.path_prefix_py(parsed.path, 2)
        by_domain.setdefault(domain, {}).setdefault(path, []).append(url)
    expected = {}
    for di, domain in enumerate(sorted(by_domain), start=1):
        paths_to_urls = {
            p: sorted(us) for p, us in sorted(by_domain[domain].items())
        }
        for si, (pattern, us) in enumerate(
            greedy_merge_paths(paths_to_urls), start=1
        ):
            expected[(domain, f"{di}.{si}")] = (pattern, sorted(us))

    assert got == expected
    assert len(got) > 0


def test_cluster_summary(spark, small_corpus):
    urls = spark.createDataFrame(small_corpus["pages"][["url"]], "url string")
    clusters = cluster_urls(urls)
    row = cluster_summary(clusters).collect()[0]
    assert row["total_domains"] >= 1
    assert row["total_clusters"] >= row["total_domains"]
    assert row["total_urls"] > 0


def test_year_clusters_order_and_content(spark):
    urls = [
        "https://h/reports/annual-2020.pdf",
        "https://h/files/x.xlsx?year=1999",
        "https://h/2005/doc.docx",
        "https://h/no/year/here",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = year_clusters(df).collect()
    assert [r["year"] for r in rows] == ["2020", "2005", "1999", "No Year"]
    assert rows[0]["urls"] == ["https://h/reports/annual-2020.pdf"]
    assert rows[-1]["url_count"] == 1


def test_domain_id_join_not_broadcast(spark, small_corpus):
    """The domain-id dim is unbounded (millions of domains on a real
    corpus): the id join must not hint a broadcast — AQE may still convert
    at runtime when stats prove the dim small, which is the desired
    behavior at every scale. The static plan must show a shuffle join on
    `domain` (the only broadcasts in the plan are the ranker's tiny
    _rpid-offset frames)."""
    from apollo_service_spark.operators.clustering import cluster_urls

    urls = spark.createDataFrame(
        [(u,) for u in small_corpus["pages"]["url"]], "url string"
    )
    clusters = cluster_urls(urls)
    plan = clusters._sc._jvm.PythonSQLUtils.explainString(
        clusters._jdf.queryExecution(), "formatted"
    )
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line or "BroadcastNestedLoopJoin" in line:
            assert "domain#" not in line, f"domain dim broadcast-hinted: {line}"


def test_cluster_greedy_query_cached_frames_bounded(spark):
    """Repeated q_cluster_greedy invocations must not accumulate persisted
    ranker intermediates (VERDICT r4 wrong #3 / ADVICE ranking.py low): the
    deferred-cleanup registry releases the previous call's frames at the
    start of the next, so a long-lived session holds at most one
    invocation's worth of cached frames."""
    from tests.conftest import SF_DIR

    from apollo_service_spark.plans import queries as Q

    jsc = spark.sparkContext._jsc.sc()
    Q.q_cluster_greedy(spark, SF_DIR).count()
    baseline = jsc.getPersistentRDDs().size()  # other tests may hold caches
    for _ in range(3):
        Q.q_cluster_greedy(spark, SF_DIR).count()
        assert jsc.getPersistentRDDs().size() <= baseline
