"""Physical-plan assertions: the plans we designed are the plans we get.

These guard the scale properties the engine depends on — filter/column
pushdown into the parquet scan, broadcast dimension joins, anti-join shape,
whole-stage codegen over the Catalyst-native predicate pipeline — so a
refactor that silently de-optimizes a plan fails CI, not a 100 TB run.
"""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_filter_and_column_pushdown(documents):
    df = documents.filter(F.col("lang") == "en").select("doc_id")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: scan must read only the two needed columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema and "source" not in read_schema


def test_robots_gate_is_broadcast_join(spark, documents):
    from apollo_service_spark.functions import urlkit
    from apollo_service_spark.operators.robots import aggregate_rules, robots_allow

    urls = documents.select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".com/p"), F.col("doc_id").cast("string")).alias("url")
    )
    links = urls.withColumn("host", urlkit.url_host(F.col("url"))).withColumn(
        "path", urlkit.url_path(F.col("url"))
    )
    rules = spark.createDataFrame(
        [("h1.com", "/admin")], "host string, disallow_prefix string"
    )
    plan = _plan(robots_allow(links, aggregate_rules(rules)))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_frontier_dedup_is_anti_join(spark, documents):
    a = documents.select(F.col("doc_id").alias("k")).filter(F.col("k") % 2 == 0)
    b = documents.select(F.col("doc_id").alias("k")).filter(F.col("k") % 3 == 0)
    plan = _plan(a.join(b, "k", "left_anti"))
    assert "LeftAnti" in plan


def test_predicate_pipeline_stays_in_codegen(spark, documents):
    """canonicalize + is_ignored + categorize must run inside one
    WholeStageCodegen span — no Python, no extra exchanges."""
    from apollo_service_spark.functions import urlkit

    urls = documents.select(
        F.concat(F.lit("https://H"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".com/p"), F.col("doc_id").cast("string"),
                 F.lit("#frag")).alias("url")
    )
    out = urls.select(urlkit.canonicalize(F.col("url")).alias("u")).filter(
        ~urlkit.is_ignored(F.col("u"))
    ).select(urlkit.categorize(F.col("u")).alias("c"))
    plan = _plan(out)
    # formatted mode marks codegen'd operators with '*' and '[codegen id : N]'
    assert "[codegen id :" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure map pipeline: zero shuffles


def test_politeness_window_single_shuffle(spark, documents):
    """Budget ranking = exactly one exchange (hash by host), no extra sorts
    beyond the window's own."""
    from apollo_service_spark.operators.politeness import select_batch

    frontier = documents.select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".com/p"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string"), F.lit(".com")).alias("host"),
        (F.col("doc_id") % 3).cast("int").alias("depth"),
    )
    selected, _carry = select_batch(frontier, None, default_budget=10)
    plan = _plan(selected)
    # formatted output lists each physical node once as "(N) NodeName";
    # exactly one Exchange node (hash by host feeding the window sort)
    import re

    exchange_nodes = re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE)
    assert len(exchange_nodes) == 1, plan
    assert "Window" in plan
