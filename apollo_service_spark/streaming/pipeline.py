"""Structured-Streaming surface for continuous crawling/extraction.

The reference's crawl loop is batch (SURVEY.md §1.3), but its progress/event
stream and "keep crawling as pages arrive" mode map naturally onto Structured
Streaming: new page files land in the corpus directory → extraction +
categorization run incrementally → results append to the sink, with
watermarked tumbling-window fetch metrics (the streaming analog of the
reference's periodic `save_results`, apollo.py:575-576).

Everything here is a standard micro-batch pipeline: ``readStream`` on the
pages directory (file source tracks processed files exactly-once),
``Trigger.AvailableNow`` for drain-and-stop semantics, checkpointLocation for
resume — the same recovery contract the batch engine gets from SnapshotStore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import urlkit
from ..functions.udfs import extract_doc_udf

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_pages_stream(spark: SparkSession, pages_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )


def extraction_stream(pages: DataFrame) -> DataFrame:
    """Incremental HTML→text extraction + URL enrichment + metadata sidecar
    columns (S8): ``doc_id = sha2(text, 256)`` and a sanitized display name,
    the reference scraper's document_id/name fields (scraper.py:303-330).

    When the pages frame carries a ``final_url`` column (post-redirect url),
    the scraper's redirect-to-404 heuristic drops the page before extraction
    (scraper.py:193-198): final url containing ``/404``, or an actual
    redirect whose target contains ``not-found``/``error``."""
    if "final_url" in pages.columns:
        pages = pages.filter(
            ~urlkit.is_redirect_404(F.col("url"), F.col("final_url"))
        )
    return (
        pages.filter(F.col("html").isNotNull())
        .withColumn("doc", extract_doc_udf(F.col("html")))
        .withColumn("extracted", F.col("doc.text"))
        .withColumn("doc_id", F.sha2(F.col("doc.text"), 256))
        .withColumn(
            "doc_name", urlkit.sanitize_filename(F.col("doc.clean_title"))
        )
        .withColumn("host", urlkit.url_host(F.col("url")))
        .withColumn("category", urlkit.categorize(F.col("url")))
        .withColumn("year", urlkit.extract_year(F.col("url")))
        .select(
            "url", "host", "category", "year", "warc_ts",
            "extracted", "doc_id", "doc_name",
        )
    )


def windowed_fetch_metrics(pages: DataFrame, window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window per-host fetch counts (late data ≤ 1 day)."""
    return (
        pages.withColumn("host", urlkit.url_host(F.col("url")))
        .withWatermark("warc_ts", "1 day")
        .groupBy(F.window("warc_ts", window).alias("win"), "host")
        .agg(F.count("*").alias("pages_fetched"))
        .select(
            F.col("win.start").alias("window_start"),
            "host",
            "pages_fetched",
        )
    )


def run_extraction_once(
    spark: SparkSession, pages_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain everything currently in pages_dir through the extraction
    pipeline and stop (Trigger.AvailableNow) — incremental re-runs only
    process new files, which is the continuous-crawl contract."""
    stream = extraction_stream(read_pages_stream(spark, pages_dir))
    query = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    query.awaitTermination()
