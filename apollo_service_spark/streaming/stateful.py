"""Custom stateful streaming operators via ``applyInPandasWithState``.

The batch engine's seen-set lives in :class:`~..operators.seen.
PartitionedBloomSeenStore`; the STREAMING analog keeps the per-group seen
state inside Spark's state store, so a continuously-arriving url stream
(new frontier files landing in a directory, a Kafka feed at production
scale) dedups across micro-batches with exactly-once state recovery from
the checkpoint — no external store round-trip per batch.

Design mirrors the batch store deliberately:

* state is keyed by ``host`` (the same partition key politeness uses), so
  one group's state holds only that host's history;
* the state payload is an ``array<long>`` of xxhash64(url) values, never
  url strings — the same 8-bytes-per-url bound as the batch store's hash
  pairs (64-bit collisions drop a legitimately-new url at ~n²/2⁶⁵ within
  one host — negligible and deterministic);
* a mega-host concentrates state in one group; at web scale, key by the
  store's salted pid (``pid_col``) instead of the raw host to spread it —
  the operator takes whatever grouping the caller provides.

``applyInPandasWithState`` is the documented Spark surface for custom
stateful logic (arbitrary state, Arrow-batched); output mode is append and
state never times out (a crawl's seen set is permanent for the crawl's
lifetime — bound it by keying on pid and resetting the checkpoint per
crawl, exactly like the batch store's ``reset``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _dedup_group(key, pdf_iter, state: GroupState):
    """Emit only urls whose hash is unseen for this group; fold the new
    hashes into the state array."""
    import pandas as pd

    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdf_iter:
        for h, url in zip(pdf["h"], pdf["url"]):
            h = int(h)
            if h not in seen:
                seen.add(h)
                out.append(url)
    state.update((list(seen),))
    yield pd.DataFrame({"url": out})


def dedup_url_stream(urls: DataFrame, group_col: str = "host") -> DataFrame:
    """Streaming cross-batch url dedup: one output row per FIRST sighting
    of a url within its group, state recovered from the checkpoint on
    restart.  ``urls`` must carry ``url`` and ``group_col`` columns."""
    keyed = urls.select(
        F.col(group_col).alias("g"),
        F.col("url"),
        F.xxhash64("url").alias("h"),
    )
    return keyed.groupBy("g").applyInPandasWithState(
        _dedup_group,
        outputStructType="url string",
        stateStructType="seen array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
