"""SnapshotStore — per-iteration commit/resume on parquet + atomic manifest.

Implements the Iceberg snapshot-commit *contract* (commit is atomic, readers
only ever see fully-committed iterations, resume picks up from the latest
committed snapshot) behind one storage interface, per SURVEY.md §7's
"Iceberg in sandbox" fallback: data files are written first, then the JSON
manifest is swapped in with ``os.replace`` (atomic on POSIX). On a real
cluster the same interface binds to Iceberg tables with
``df.writeTo(...).append()`` snapshots; engine code never touches paths
directly, so the swap is one class.

Layout::

    <root>/_manifest.json                      latest committed state
    <root>/<table>/iter=<NNNNN>/*.parquet      per-iteration data
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


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
        for name, df in tables.items():
            path = self._table_dir(name, iteration)
            df.write.mode("overwrite").parquet(path)
            written[name] = path
        if callable(metrics):
            metrics = metrics()
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
