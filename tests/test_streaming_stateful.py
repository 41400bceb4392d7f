"""Cross-batch stateful streaming dedup (streaming/stateful.py)."""

import os

from apollo_service_spark.streaming.stateful import dedup_url_stream

SCHEMA = "url string, host string"


def _write_batch(spark, d, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, name))


def _run(spark, in_dir, out_dir, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(in_dir + "/*")
    )
    q = (
        dedup_url_stream(stream, group_col="host")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [r["url"] for r in spark.read.parquet(out_dir).collect()]


def test_dedup_across_micro_batches_and_restarts(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    a = [("https://h1/x", "h1"), ("https://h1/y", "h1"), ("https://h2/x", "h2")]
    b = [("https://h1/x", "h1"), ("https://h1/z", "h1")]  # /x repeats
    _write_batch(spark, in_dir, a, "b0")
    _write_batch(spark, in_dir, b, "b1")
    got = _run(spark, in_dir, out_dir, ckpt)
    # each url exactly once, across micro-batches
    assert sorted(got) == sorted(
        ["https://h1/x", "https://h1/y", "https://h2/x", "https://h1/z"]
    )

    # restart the query with the SAME checkpoint and a new file: state must
    # be recovered — the repeat of /y is suppressed, only /w is new
    c = [("https://h1/y", "h1"), ("https://h1/w", "h1")]
    _write_batch(spark, in_dir, c, "b2")
    got2 = _run(spark, in_dir, out_dir, ckpt)
    assert sorted(got2) == sorted(
        [
            "https://h1/x",
            "https://h1/y",
            "https://h2/x",
            "https://h1/z",
            "https://h1/w",
        ]
    )


def test_same_url_different_hosts_both_emit(spark, tmp_path):
    """State is per group: the same path on two hosts is two urls."""
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    _write_batch(
        spark, in_dir,
        [("https://h1/p", "h1"), ("https://h2/p", "h2"), ("https://h1/p", "h1")],
        "b0",
    )
    got = _run(spark, in_dir, out_dir, ckpt)
    assert sorted(got) == ["https://h1/p", "https://h2/p"]
