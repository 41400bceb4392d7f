"""Partitioned, incrementally-maintained bloom seen-store (the scale path).

At 10^10 seen URLs a single bloom filter is ~12 GB — too big to broadcast and
absurd to rebuild every superstep (which ``bloom.build_bloom`` would do). The
north-star design is a *partitioned* seen set: URLs are hashed into P
partitions by salted host hash PLUS a per-url spread offset (a pure function
of the url — see ``pid_col``), so a mega-host distributes uniformly across
pids instead of pinning one task; each partition owns a bitmap of m/P bits
stored as one blob next to the seen table. Per iteration:

* **update**: the iteration's seen delta is grouped by partition id and each
  group's ``applyInPandas`` task OR-merges its delta bits into its own blob
  (exclusive writer per pid, atomic ``os.replace``) — cost proportional to
  the DELTA, not the accumulated set;
* **filter**: candidates are grouped by the same pid; each task loads only
  its partition's blob (m/P bits, not m) and flags maybe-seen rows; only
  those go to the exact anti-join, which keeps correctness exact regardless
  of bloom state.

* **exact check, partition-local**: alongside each bitmap the store keeps the
  partition's exact url set as parquet files (``urls/pid=N/``). ``filter_new``
  resolves bloom maybes against the pid-local exact set *inside the same
  task* — no shuffle of the accumulated seen table, no anti-join stage: the
  only exchange in the dedup path is the one groupBy-pid shuffle of the
  (small) candidate delta. Each task reads only its own pid's files
  (accumulated/P bytes), which is the same IO a bucketed-join scan would do,
  minus the join machinery.

Crash-safety invariant: blobs and url files are updated BEFORE the snapshot
manifest commits, so the store is always a superset of the committed seen
set. A superset is harmless: re-run iterations re-schedule from the committed
frontier, and any url the superset wrongly flags as seen is one the crawl
already scheduled (it is also in the exclude set) — never a lost URL
(tests/test_seen_store.py locks this in).

Concurrency contract (task retries / zombie attempts): Spark can run two
attempts of the same ``applyInPandas`` group — a hung attempt's retry
finishes, the stage moves on, and the original attempt completes LATER.
Three rules make every interleaving safe:

* **delta url files are append-only and uniquely named** — a duplicate
  attempt writes a second file with the same rows, which membership checks
  don't care about; compaction is write-new-then-delete-old, and every
  read/delete of a delta file tolerates the file vanishing under it (a
  concurrent compaction subsumed it);
* **blobs are epoch-versioned, never overwritten in place**
  (``pid=N-epoch=K-<uuid>.bin`` — the random suffix means a PATH is never
  reused either, so worker-local bitmap caches stay valid across
  ``reset()``, whose epoch numbering restarts at 0): readers take the
  highest epoch, so a zombie
  writer from superstep *k* completing after superstep *k+1*'s write cannot
  regress the bitmap below the url files — it only re-creates an older-epoch
  file that readers ignore and the next writer garbage-collects. (An
  in-place ``os.replace`` here would be a REAL bug, not just noise: a
  regressed bloom lets ``filter_new`` skip the exact check for a seen url.)
* **speculative execution must stay off for the writer stage**
  (``spark.speculation`` — off by default; the engine's sessions never
  enable it), keeping concurrent same-group attempts a rare retry case
  rather than the norm.

On a real cluster the blobs live on the shared store (S3/HDFS) and each task
reads/writes only its own ~MB-scale blob; nothing bloom-shaped ever crosses
the driver. Size ``n_partitions`` so accumulated/P fits a task: at 10^10 urls
and 4096 pids a partition holds ~2.4M urls (~200 MB raw, ~50 MB parquet).
"""

from __future__ import annotations

import contextlib
import glob
import os
import re
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import urlkit
from .bloom import BloomFilter, optimal_bits, optimal_k

_H1_SALT = 0x9E3779B9
_H2_SALT = 0x85EBCA6B

_BLOB_RE = re.compile(r"pid=(\d+)-epoch=(\d+)(?:-[0-9a-f]+)?\.bin$")


def _latest_blob(root: str, pid: int) -> str | None:
    """Highest-epoch blob for a pid (readers ignore zombie re-creations of
    older epochs); returns None when the pid has no blob yet.

    Equal epochs (two attempts of the same writer task, identical content by
    construction) tie-break on the path string for determinism. Blob names
    carry a per-write random suffix so a path is NEVER reused — epoch
    numbering restarts at 0 after ``reset()``, and a reused path would let a
    long-lived Python worker's ``_BLOOMS`` entry serve the PREVIOUS crawl's
    bitmap (bloom false negatives ⇒ seen urls re-scheduled)."""
    best, best_epoch = None, -1
    for path in glob.glob(os.path.join(root, f"pid={pid:05d}-epoch=*.bin")):
        m = _BLOB_RE.search(path)
        if m and (int(m.group(2)), path) > (best_epoch, best or ""):
            best, best_epoch = path, int(m.group(2))
    return best


def _read_delta_tables(pid_dir: str, columns=None):
    """Read every delta parquet in a pid dir, tolerating a concurrent
    compaction racing the reader.

    A compaction is write-new-then-delete-old, so a single glob+read pass has
    a window: glob BEFORE the compact file's ``os.replace`` lands, read AFTER
    the compactor deleted the deltas — every read raises FileNotFoundError
    and the pid's membership set would silently read as empty (re-scheduling
    already-seen urls). The fix: whenever ANY file vanished mid-read, redo
    the whole glob+read pass — after a compaction the re-glob is guaranteed
    to see the compact file, so the loop terminates (each retry implies a
    compaction completed, and compactions per pid are finite between calls).
    """
    while True:
        tables = []
        vanished = False
        for f in sorted(glob.glob(os.path.join(pid_dir, "*.parquet"))):
            try:
                tables.append(pq.read_table(f, columns=columns))
            except FileNotFoundError:
                vanished = True
                break
        if not vanished:
            return tables


_MIX = 0xFF51AFD7ED558CCD  # 64-bit mix multiplier for the (h1,h2) pair key


class _SegmentCache:
    """Executor-local cache of per-delta-file membership segments.

    The store's delta files are immutable once written (append-only, uniquely
    named; compaction writes a NEW file and deletes the old ones), so a
    Python worker that already parsed a file never needs to re-read it: a
    steady-state superstep's filter cost becomes proportional to the files
    ADDED since the last superstep, not the accumulated set — the same
    reason the update path scales (cost tracks the delta). On a real cluster
    this is the executor-local SSD/memory cache every S3-backed store layers
    in front of immutable blobs.

    A segment is ``(key_unsorted, key_sorted, url_column)``: the mixed
    64-bit (h1,h2) pair key aligned with the file's rows (for the exact url
    resolve mask), the same keys sorted (for ``np.searchsorted`` membership),
    and the Arrow url column (strings stay Arrow-packed until a hit
    materializes just the colliding rows). Eviction is LRU by byte budget;
    entries for files a compaction deleted are dropped when their pid dir is
    next globbed (immutability makes stale entries harmless, just wasteful).
    """

    def __init__(self, max_bytes: int = 512 * 1024 * 1024):
        from collections import OrderedDict

        self.max_bytes = max_bytes
        self.entries = OrderedDict()  # path -> (segment, nbytes)
        self.total = 0

    def _segment_from_table(self, table):
        h1 = table.column("h1").to_numpy().astype(np.uint64)
        h2 = table.column("h2").to_numpy().astype(np.uint64)
        key = h1 * np.uint64(_MIX) ^ h2
        urls = table.column("url").combine_chunks()
        nbytes = key.nbytes * 2 + urls.nbytes
        return (key, np.sort(key), urls), nbytes

    def get(self, path: str):
        hit = self.entries.get(path)
        if hit is not None:
            self.entries.move_to_end(path)
            return hit[0]
        # may raise FileNotFoundError — caller re-globs (compaction race)
        seg, nbytes = self._segment_from_table(
            pq.read_table(path, columns=["h1", "h2", "url"])
        )
        self.entries[path] = (seg, nbytes)
        self.total += nbytes
        while self.total > self.max_bytes and len(self.entries) > 1:
            _, (_seg, freed) = self.entries.popitem(last=False)
            self.total -= freed
        return seg

    def prune(self, pid_dir: str, live: set):
        """Drop entries for this pid dir that a compaction deleted."""
        prefix = pid_dir.rstrip(os.sep) + os.sep
        dead = [
            p
            for p in self.entries
            if p.startswith(prefix) and p not in live
        ]
        for p in dead:
            _seg, freed = self.entries.pop(p)
            self.total -= freed


class _BloomCache:
    """Worker-local bloom-bitmap LRU, keyed by blob path (epoch-versioned
    names are immutable, so entries can never be stale). Two bounds: old
    epochs of the SAME pid are evicted eagerly when a newer epoch loads, and
    a total byte budget evicts LRU across pids — a reused Python worker that
    Spark hands different pid groups each superstep would otherwise
    accumulate one full bitmap per pid it ever touched (at the module's
    10^10-url sizing, the whole multi-GB store per worker)."""

    def __init__(self, max_bytes: int = 512 * 1024 * 1024):
        from collections import OrderedDict

        self.max_bytes = max_bytes
        self.entries = OrderedDict()  # path -> bitmap
        self.total = 0

    def get(self, path: str) -> np.ndarray:
        bm = self.entries.get(path)
        if bm is not None:
            self.entries.move_to_end(path)
            return bm
        bm = np.fromfile(path, dtype=np.uint8)
        stem = path.rsplit("-epoch=", 1)[0]
        for old in [
            p for p in self.entries if p.rsplit("-epoch=", 1)[0] == stem
        ]:
            self.total -= self.entries.pop(old).nbytes
        self.entries[path] = bm
        self.total += bm.nbytes
        while self.total > self.max_bytes and len(self.entries) > 1:
            _, dropped = self.entries.popitem(last=False)
            self.total -= dropped.nbytes
        return bm


_SEGMENTS = _SegmentCache()
_BLOOMS = _BloomCache()


def _load_pid_segments(pid_dir: str, cache: _SegmentCache):
    """All membership segments for a pid, via the worker-local cache.

    Same compaction-race contract as ``_read_delta_tables``: if any file
    vanishes between the glob and its read, redo the whole pass — the
    re-glob then sees the compact file that subsumed it.
    """
    while True:
        paths = sorted(glob.glob(os.path.join(pid_dir, "*.parquet")))
        cache.prune(pid_dir, set(paths))
        segments = []
        vanished = False
        for path in paths:
            try:
                segments.append(cache.get(path))
            except FileNotFoundError:
                vanished = True
                break
        if not vanished:
            return segments


def _cached_bitmap(path: str) -> np.ndarray:
    """Bloom bitmap by blob path via the worker-local LRU (see
    :class:`_BloomCache` for the two eviction bounds)."""
    return _BLOOMS.get(path)


class PartitionedBloomSeenStore:
    def __init__(
        self,
        root: str,
        n_partitions: int = 32,
        expected_urls: int = 1_000_000,
        fpp: float = 0.01,
        salt: int = 42,
        compact_above: int = 16,
    ):
        self.compact_above = compact_above
        self.root = os.path.join(root, "seen_bloom")
        self.urls_root = os.path.join(root, "seen_urls")
        os.makedirs(self.root, exist_ok=True)
        os.makedirs(self.urls_root, exist_ok=True)
        self.n_partitions = n_partitions
        total_bits = optimal_bits(expected_urls, fpp)
        self.bits_per_partition = max(8192, total_bits // n_partitions)
        self.k = optimal_k(self.bits_per_partition, max(expected_urls // n_partitions, 1))
        self.salt = salt

    # -- partition key -------------------------------------------------------

    def pid_col(self, host_col, url_col) -> object:
        """Partition id: salted host hash + per-url spread — a pure function
        of the url, so update and filter agree row-by-row, while a mega-host
        spreads uniformly across pids instead of pinning one task (SURVEY §7
        skew risk; VERDICT r3 task #4). NOTE: the pid assignment is part of
        the store's on-disk layout — changing salt/spread invalidates an
        existing store (a fresh crawl resets it; resume reuses the engine
        config that created it)."""
        return urlkit.host_salted_partition(
            host_col, self.n_partitions, self.salt, url=url_col
        )

    def reset(self) -> None:
        """Drop all blobs and exact url files (fresh-crawl start on a root
        that may hold a previous crawl's seen state)."""
        for path in glob.glob(os.path.join(self.root, "pid=*.bin")):
            with contextlib.suppress(FileNotFoundError):
                os.remove(path)
        for path in glob.glob(os.path.join(self.urls_root, "pid=*", "*.parquet")):
            with contextlib.suppress(FileNotFoundError):
                os.remove(path)

    # -- update --------------------------------------------------------------

    def update(self, delta: DataFrame) -> int:
        """OR the delta's urls into the per-partition bitmaps and append them
        to the per-partition exact url files.

        delta: DataFrame with (url, host). One applyInArrow group per pid ⇒
        exclusive writer per blob; atomic replace keeps readers consistent.
        Arrow-native end-to-end: the task's url column is written to parquet
        straight from the Arrow batch — no pandas object-string
        materialization of the delta (measured ~2x on the update wall at
        2M urls/superstep).
        The exact urls land as one immutable parquet file per (pid, update) —
        append-only, so a concurrent/crashed reader never sees a torn file.
        When a pid accumulates more than ``compact_above`` (+ a per-pid
        stagger offset, see below) delta files, the
        writer task merges them into one (write-new-then-delete-old: a crash
        in between leaves duplicate rows, which membership checks don't
        care about — never a lost url). Returns number of partitions touched.
        """
        n_bits, k = self.bits_per_partition, self.k
        root, urls_root = self.root, self.urls_root
        compact_above = self.compact_above

        keyed = delta.select(
            F.col("url"),
            F.xxhash64("url", F.lit(_H1_SALT)).alias("h1"),
            F.xxhash64("url", F.lit(_H2_SALT)).alias("h2"),
            self.pid_col(F.col("host"), F.col("url")).alias("pid"),
        )

        def merge(table: pa.Table) -> pa.Table:
            pid = int(table.column("pid")[0].as_py())
            bloom = BloomFilter(np.zeros(n_bits // 8, dtype=np.uint8), n_bits, k)
            bloom.add_batch(
                table.column("h1").to_numpy(), table.column("h2").to_numpy()
            )
            prev = _latest_blob(root, pid)
            epoch = 0
            if prev is not None:
                bloom.bitmap |= np.fromfile(prev, dtype=np.uint8)
                epoch = int(_BLOB_RE.search(prev).group(2)) + 1
            pid_dir = os.path.join(urls_root, f"pid={pid:05d}")
            os.makedirs(pid_dir, exist_ok=True)
            fname = os.path.join(pid_dir, f"delta-{uuid.uuid4().hex}.parquet")
            pq.write_table(table.select(["h1", "h2", "url"]), fname + ".tmp")
            os.replace(fname + ".tmp", fname)
            existing = sorted(glob.glob(os.path.join(pid_dir, "*.parquet")))
            # stagger the compaction threshold per pid: every pid gains one
            # delta file per superstep, so a single threshold makes ALL pids
            # compact in the SAME superstep — an O(accumulated) rewrite storm
            # that showed up as one 60s store update in the 10^7 soak. The
            # pid-dependent offset spreads compactions across supersteps
            # (each still compacts at the same long-run frequency).
            if len(existing) > compact_above + (pid % compact_above):
                tables = _read_delta_tables(pid_dir)
                cname = os.path.join(
                    pid_dir, f"compact-{uuid.uuid4().hex}.parquet"
                )
                pq.write_table(pa.concat_tables(tables), cname + ".tmp")
                os.replace(cname + ".tmp", cname)
                for f in existing:
                    # a racing attempt's compaction may have removed f already
                    with contextlib.suppress(FileNotFoundError):
                        os.remove(f)
            # epoch-versioned blob: never replace in place (see module
            # docstring — a zombie attempt overwriting a newer blob would
            # regress the bloom below the url files)
            # unique per-write suffix: paths are never reused (epoch numbers
            # restart after reset(); worker-local caches key on the path)
            path = os.path.join(
                root, f"pid={pid:05d}-epoch={epoch:06d}-{uuid.uuid4().hex}.bin"
            )
            tmp = path + f".tmp-{uuid.uuid4().hex}"
            bloom.bitmap.tofile(tmp)
            os.replace(tmp, path)
            # GC uses the same (epoch, path) total order readers select by:
            # strictly-lower tuples are losers — older epochs AND same-epoch
            # siblings left by retried/speculative attempts (which would
            # otherwise orphan one full-size bitmap per retry, since a plain
            # `epoch <` check never matches them at the final epoch)
            for old in glob.glob(os.path.join(root, f"pid={pid:05d}-epoch=*.bin")):
                m = _BLOB_RE.search(old)
                if m and (int(m.group(2)), old) < (epoch, path):
                    with contextlib.suppress(FileNotFoundError):
                        os.remove(old)
            return pa.table(
                {
                    "pid": pa.array([pid], pa.int32()),
                    "n": pa.array([len(table)], pa.int64()),
                }
            )

        touched = (
            keyed.groupBy("pid")
            .applyInArrow(merge, schema="pid int, n long")
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
            "_pid", self.pid_col(F.col("host"), F.col("url"))
        )
        out_schema = keyed.drop("_pid").withColumn(
            "_maybe_seen", F.lit(True)
        ).schema

        def check(table: pa.Table) -> pa.Table:
            pid = int(table.column("_pid")[0].as_py())
            path = _latest_blob(root, pid)
            table = table.drop_columns(["_pid"])
            if path is None:
                flags = np.zeros(table.num_rows, dtype=bool)
            else:
                bloom = BloomFilter(_cached_bitmap(path), n_bits, k)
                flags = bloom.might_contain(
                    table.column("_h1").to_numpy(),
                    table.column("_h2").to_numpy(),
                )
            return table.append_column("_maybe_seen", pa.array(flags))

        flagged = keyed.groupBy("_pid").applyInArrow(check, schema=out_schema)
        definitely_new = flagged.filter(~F.col("_maybe_seen")).select(*cols)
        maybe_seen = flagged.filter(F.col("_maybe_seen")).select(*cols)
        return definitely_new, maybe_seen

    def filter_new(self, candidates: DataFrame) -> DataFrame:
        """Exact partition-local dedup: candidates not yet in the seen set.

        One applyInArrow per pid: bloom-check every row (bit probes, cheap),
        then resolve the bloom maybes against the pid's exact url files loaded
        inside the task. The accumulated seen set never enters a shuffle —
        the only exchange is the groupBy-pid of the candidate delta, on the
        same salted-host key the rest of the frontier state uses. Correctness
        is exact regardless of bloom false positives.

        Membership is resolved on the persisted int64 hash PAIRS, fully
        vectorized: ``np.searchsorted`` of a combined (h1,h2) key against the
        pid's cached sorted keys, with a url string comparison ONLY for rows
        whose combined key collides (≈ the true duplicates plus a ~2^-64
        accident rate). The whole task is Arrow-native: candidate columns
        arrive as an Arrow table (no pandas conversion), and the string
        confirm is ``pyarrow.compute.is_in`` of the url column against the
        colliding rows of the cached segments — NO url ever materializes as
        a Python string, in either the hot or the hit path.
        """
        n_bits, k = self.bits_per_partition, self.k
        root, urls_root = self.root, self.urls_root
        cols = candidates.columns

        keyed = candidates.withColumn(
            "_h1", F.xxhash64("url", F.lit(_H1_SALT))
        ).withColumn("_h2", F.xxhash64("url", F.lit(_H2_SALT))).withColumn(
            "_pid", self.pid_col(F.col("host"), F.col("url"))
        )
        out_schema = keyed.drop("_h1", "_h2", "_pid").schema

        def check(table: pa.Table) -> pa.Table:
            pid = int(table.column("_pid")[0].as_py())
            blob = _latest_blob(root, pid)
            out_cols = [
                c for c in table.column_names if c not in ("_h1", "_h2", "_pid")
            ]
            if blob is None:
                return table.select(out_cols)
            h1 = table.column("_h1").to_numpy()
            h2 = table.column("_h2").to_numpy()
            bloom = BloomFilter(_cached_bitmap(blob), n_bits, k)
            maybe = bloom.might_contain(h1, h2)
            keep = None
            if maybe.any():
                pid_dir = os.path.join(urls_root, f"pid={pid:05d}")
                # membership segments come from the worker-local cache of
                # immutable delta files: only files written SINCE this
                # worker's last call hit the filesystem (steady-state cost
                # tracks the delta, not the accumulated set)
                segments = _load_pid_segments(pid_dir, _SEGMENTS)
                if segments:
                    # combined 64-bit key of the (h1,h2) pair — wraparound
                    # multiply-xor mixes both words; a pair-key collision
                    # between DIFFERENT urls needs a joint 64-bit accident,
                    # resolved below with a string check on the hits only
                    cand_key = (
                        h1.astype(np.uint64) * np.uint64(_MIX)
                    ) ^ h2.astype(np.uint64)
                    hits = np.zeros(len(cand_key), dtype=bool)
                    for _key, key_sorted, _urls in segments:
                        if len(key_sorted) == 0:
                            continue
                        idx = np.searchsorted(key_sorted, cand_key)
                        idx[idx == len(key_sorted)] = 0
                        hits |= key_sorted[idx] == cand_key
                    hits &= maybe
                    if hits.any():
                        # exact resolve: Arrow is_in of the url column
                        # against the colliding segment rows — C++ hash-set
                        # probe, zero Python strings
                        hit_keys = cand_key[hits]
                        chunks = []
                        for key, _key_sorted, urls in segments:
                            relevant = np.isin(key, hit_keys)
                            if relevant.any():
                                chunks.append(urls.filter(pa.array(relevant)))
                        if chunks:
                            confirmed = (
                                pc.is_in(
                                    table.column("url"),
                                    value_set=pa.chunked_array(chunks),
                                )
                                .to_numpy(zero_copy_only=False)
                                .astype(bool)
                            )
                            keep = ~(hits & confirmed)
            if keep is None:
                return table.select(out_cols)
            return table.filter(pa.array(keep)).select(out_cols)

        return keyed.groupBy("_pid").applyInArrow(check, schema=out_schema)
