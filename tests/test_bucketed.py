"""Bucketed writes must buy exchange-free co-located joins
(sources/bucketed.py)."""

import pytest
from pyspark.sql import functions as F

from apollo_service_spark.sources.bucketed import read_bucketed, write_bucketed


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    a = spark.range(2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit("/p"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 5).alias("depth"),
    )
    b = a.select("url", F.sha2("url", 256).alias("body_hash"))
    write_bucketed(a, "t_frontier", "url", n_buckets=8, path=str(tmp_path / "a"))
    write_bucketed(b, "t_pages", "url", n_buckets=8, path=str(tmp_path / "b"))
    yield "t_frontier", "t_pages"
    spark.sql("DROP TABLE IF EXISTS t_frontier")
    spark.sql("DROP TABLE IF EXISTS t_pages")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, ta).join(read_bucketed(spark, tb), "url")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan  # the whole point of bucketing
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_pays_exchanges(spark, bucketed_pair, tmp_path):
    """Control: the identical join over plain parquet re-shuffles both
    sides — demonstrating what the bucketed write amortizes away."""
    ta, tb = bucketed_pair
    pa, pb = str(tmp_path / "pa"), str(tmp_path / "pb")
    read_bucketed(spark, ta).write.mode("overwrite").parquet(pa)
    read_bucketed(spark, tb).write.mode("overwrite").parquet(pb)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark.read.parquet(pa).join(spark.read.parquet(pb), "url"))
        assert "Exchange" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_round_trip_values(spark, bucketed_pair):
    ta, _ = bucketed_pair
    rows = read_bucketed(spark, ta).collect()
    assert len(rows) == 2000
    assert all(r["url"].startswith("https://h") for r in rows)
