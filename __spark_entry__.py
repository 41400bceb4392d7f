"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus the
training-data-pipeline operators for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apollo_service_spark.plans import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: synthesize the URL corpus
    from `documents`, run categorizer + year extractor + host grouping in one
    pass — the reference's stage-2..4 pipeline as a single DataFrame job."""
    from pyspark.sql import functions as F

    from apollo_service_spark.functions import urlkit
    from apollo_service_spark.plans.queries import _urls_df

    sf_dir = "/root/testdata/sf0.001"
    urls = _urls_df(spark, sf_dir)
    return (
        urls.select(
            "url",
            urlkit.url_host(F.col("url")).alias("host"),
            urlkit.categorize(F.col("url")).alias("category"),
            urlkit.extract_year(F.col("url")).alias("year"),
            urlkit.is_document_url(F.col("url")).alias("is_document"),
        )
        .groupBy("host", "category", "year", "is_document")
        .agg(F.count("*").alias("cnt"))
        .orderBy("host", "category", "year")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents for the SQL-expressible subset."""
    return _registry.oracle_sql()
