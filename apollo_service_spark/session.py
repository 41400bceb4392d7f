"""SparkSession factory with the engine's tuned defaults.

Local-mode settings mirror what a 1000-executor cluster deployment would set
via spark-submit conf: AQE on (runtime coalescing + skew-join splitting),
shuffle partitions sized to the parallelism level, Arrow enabled for the two
pandas-UDF kernels, and broadcast threshold left at default so the small
robots/politeness dimension tables broadcast automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "apollo-service-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; on a real cluster this is 2-3× total cores
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = cpus if n == "*" else int(n)

    # Input split sizing (guide §6): this engine's scans feed compute-dense
    # text projections (regex tiers, Catalyst folds, Arrow kernels), so
    # smaller splits keep every core busy long before the 128 MB default
    # would.  16 MB costs nothing in local mode (task dispatch is ~ms) and
    # still yields ≤ 8 tasks/GB; a pure-I/O deployment at cluster scale
    # should raise this back to 128m-1g via the env knob.  Row-group
    # granularity still bounds real splits — sources/tables.py rebalances
    # the genuinely unsplittable small files.
    max_partition_bytes = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", max_partition_bytes)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE (r6, measured): lowering coalescePartitions.minPartitionSize
        # to 64k (parallelism-first coalescing for small shuffles) was A/B
        # tested across the suite — it bought ~1 s on cluster_greedy (whose
        # post-distinct projection AQE squeezes to 1-3 partitions) but cost
        # ~0.5-0.8 s EACH on the line/gram pipelines, net negative.  The
        # default stays; cluster_greedy fixes its own coalescing locally.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # AQEPropagateEmptyRelation can collapse a subtree holding a
        # CollectMetrics node (df.observe) before it runs, resolving the
        # engine's per-superstep Observations to an empty row (seen on the
        # final crawl iterations where new_links is empty). The engine's
        # metrics ride the commit writes as observations, so keep the node
        # alive; empty-relation pruning buys nothing on these explicit plans.
        .config(
            "spark.sql.adaptive.optimizer.excludedRules",
            "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation",
        )
    )
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    return builder.getOrCreate()
