"""SnapshotStore commit/read/resume contract."""

import pytest

from apollo_service_spark.sources.storage import SnapshotStore


def test_commit_and_read(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    assert store.latest_iteration() == -1
    df0 = spark.createDataFrame([("a",), ("b",)], "url string")
    store.commit(0, {"seen_delta": df0}, metrics={"n": 2})
    df1 = spark.createDataFrame([("c",)], "url string")
    store.commit(1, {"seen_delta": df1}, metrics={"n": 1})

    assert store.latest_iteration() == 1
    acc = store.read_accumulated(spark, "seen_delta")
    assert {r["url"] for r in acc.collect()} == {"a", "b", "c"}
    latest = store.read_latest(spark, "seen_delta")
    assert {r["url"] for r in latest.collect()} == {"c"}
    assert [m["n"] for m in store.iteration_metrics()] == [2, 1]


def test_non_sequential_commit_rejected(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s2"))
    df = spark.createDataFrame([("a",)], "url string")
    with pytest.raises(ValueError):
        store.commit(1, {"t": df})


def test_uncommitted_data_invisible(spark, tmp_path):
    """Data written without a manifest swap must be ignored by readers."""
    root = str(tmp_path / "s3")
    store = SnapshotStore(root)
    df = spark.createDataFrame([("a",)], "url string")
    store.commit(0, {"t": df})
    # simulate a crash mid-commit: iteration-1 data exists, no manifest entry
    df.write.mode("overwrite").parquet(f"{root}/t/iter=00001")
    assert store.latest_iteration() == 0
    acc = store.read_accumulated(spark, "t")
    assert acc.count() == 1
