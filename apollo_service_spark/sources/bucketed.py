"""Bucketed table writes — pre-shuffled storage for co-located joins.

The frontier engine's hottest join is candidates ⋈ pages on ``url``, every
superstep (``operators/frontier.py``).  Within one run the engine pays that
shuffle once (it repartitions + persists the corpus on the join key); a
LONG-LIVED crawl should not pay it once per run either: store the corpus
bucketed by the join key and every future session's scan comes out of the
parquet files already hash-partitioned — Catalyst plans the join with NO
Exchange on the bucketed side(s).  At the 100 TB corpus scale that is the
difference between re-shuffling the whole table per job and never
shuffling it again (the write amortizes the shuffle exactly once).

Mechanics: ``bucketBy`` is metadata the session catalog records with the
table, so bucketed tables go through ``saveAsTable`` (optionally with an
explicit ``path`` → an external table whose files live where you point).
Both sides of a join skip their exchanges when bucketed by the same key
into the same bucket count; one bucketed side still saves its own exchange
against a shuffled other side.  ``sortBy`` within buckets additionally
enables sort-merge joins without a per-task sort.

``tests/test_bucketed.py`` asserts the join plan drops the Exchange nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and, by default, bucket-sorted) table.

    ``path`` makes it an external table (files live there, metadata in the
    session catalog); omit it to write under the session warehouse dir.
    ``n_buckets`` must match across tables meant to co-locate — pick the
    cluster-sized number once (e.g. executors × cores × small factor) and
    reuse it corpus-wide."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata only survives the catalog
    route — ``spark.read.parquet(path)`` on the same files would NOT know
    the layout and the join exchange would come back)."""
    return spark.table(table)
