"""Partitioned, incrementally-maintained bloom seen-store (the scale path).

At 10^10 seen URLs a single bloom filter is ~12 GB — too big to broadcast and
absurd to rebuild every superstep (which ``bloom.build_bloom`` would do). The
north-star design is a *partitioned* seen set: URLs are salted-host-hashed
into P partitions; each partition owns a bitmap of m/P bits stored as one
blob next to the seen table. Per iteration:

* **update**: the iteration's seen delta is grouped by partition id and each
  group's ``applyInPandas`` task OR-merges its delta bits into its own blob
  (exclusive writer per pid, atomic ``os.replace``) — cost proportional to
  the DELTA, not the accumulated set;
* **filter**: candidates are grouped by the same pid; each task loads only
  its partition's blob (m/P bits, not m) and flags maybe-seen rows; only
  those go to the exact anti-join, which keeps correctness exact regardless
  of bloom state.

Crash-safety invariant: blobs are updated BEFORE the snapshot manifest
commits, so the bloom is always a superset of the committed seen set. A
superset can only cause false ``maybe_seen`` routes, which the exact
anti-join resolves — never a lost URL.

On a real cluster the blobs live on the shared store (S3/HDFS) and each task
reads/writes only its own ~MB-scale blob; nothing bloom-shaped ever crosses
the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import urlkit
from .bloom import BloomFilter, optimal_bits, optimal_k

_H1_SALT = 0x9E3779B9
_H2_SALT = 0x85EBCA6B


class PartitionedBloomSeenStore:
    def __init__(
        self,
        root: str,
        n_partitions: int = 32,
        expected_urls: int = 1_000_000,
        fpp: float = 0.01,
        salt: int = 42,
    ):
        self.root = os.path.join(root, "seen_bloom")
        os.makedirs(self.root, exist_ok=True)
        self.n_partitions = n_partitions
        total_bits = optimal_bits(expected_urls, fpp)
        self.bits_per_partition = max(8192, total_bits // n_partitions)
        self.k = optimal_k(self.bits_per_partition, max(expected_urls // n_partitions, 1))
        self.salt = salt

    # -- partition key -------------------------------------------------------

    def pid_col(self, host_col) -> object:
        return urlkit.host_salted_partition(host_col, self.n_partitions, self.salt)

    def _blob_path(self, pid: int) -> str:
        return os.path.join(self.root, f"pid={pid:05d}.bin")

    # -- update --------------------------------------------------------------

    def update(self, delta: DataFrame) -> int:
        """OR the delta's urls into the per-partition bitmaps.

        delta: DataFrame with (url, host). One applyInPandas group per pid ⇒
        exclusive writer per blob; atomic replace keeps readers consistent.
        Returns number of partitions touched.
        """
        n_bits, k = self.bits_per_partition, self.k
        root = self.root

        keyed = delta.select(
            F.xxhash64("url", F.lit(_H1_SALT)).alias("h1"),
            F.xxhash64("url", F.lit(_H2_SALT)).alias("h2"),
            self.pid_col(F.col("host")).alias("pid"),
        )

        def merge(pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(pdf["pid"].iloc[0])
            path = os.path.join(root, f"pid={pid:05d}.bin")
            bloom = BloomFilter(np.zeros(n_bits // 8, dtype=np.uint8), n_bits, k)
            bloom.add_batch(pdf["h1"].to_numpy(), pdf["h2"].to_numpy())
            if os.path.exists(path):
                bloom.bitmap |= np.fromfile(path, dtype=np.uint8)
            tmp = path + ".tmp"
            bloom.bitmap.tofile(tmp)
            os.replace(tmp, path)
            return pd.DataFrame({"pid": [pid], "n": [len(pdf)]})

        touched = (
            keyed.groupBy("pid")
            .applyInPandas(merge, schema="pid int, n long")
            .count()
        )
        return int(touched)

    # -- filter --------------------------------------------------------------

    def split_candidates(self, candidates: DataFrame) -> tuple:
        """(definitely_new, maybe_seen) via per-partition blob lookups.

        candidates: DataFrame with (url, host, ...). Each pid group's task
        loads only its own blob; rows for partitions with no blob yet are all
        definitely-new.
        """
        n_bits, k = self.bits_per_partition, self.k
        root = self.root
        cols = candidates.columns

        keyed = candidates.withColumn(
            "_h1", F.xxhash64("url", F.lit(_H1_SALT))
        ).withColumn("_h2", F.xxhash64("url", F.lit(_H2_SALT))).withColumn(
            "_pid", self.pid_col(F.col("host"))
        )
        out_schema = keyed.drop("_pid").withColumn(
            "_maybe_seen", F.lit(True)
        ).schema

        def check(pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(pdf["_pid"].iloc[0])
            path = os.path.join(root, f"pid={pid:05d}.bin")
            pdf = pdf.drop(columns=["_pid"])
            if not os.path.exists(path):
                pdf["_maybe_seen"] = False
                return pdf
            bloom = BloomFilter(np.fromfile(path, dtype=np.uint8), n_bits, k)
            flags = bloom.might_contain(
                pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy()
            )
            pdf["_maybe_seen"] = flags
            return pdf

        flagged = keyed.groupBy("_pid").applyInPandas(check, schema=out_schema)
        definitely_new = flagged.filter(~F.col("_maybe_seen")).select(*cols)
        maybe_seen = flagged.filter(F.col("_maybe_seen")).select(*cols)
        return definitely_new, maybe_seen
