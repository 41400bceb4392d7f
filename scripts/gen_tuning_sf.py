#!/usr/bin/env python
"""Generate an sf1.0-SHAPED tuning dataset (NOT the driver's data).

The driver's round-end bench escalated to sf=1.0 (BENCH_r05.json), but the
local /root/testdata only goes to sf0.1.  This script fabricates tables with
the same schemas, the same per-table row-count scaling (10x sf0.1), and the
same empirical distributions (31-word vocabulary, uniform 10-100 words/doc,
source = 'src' || doc_id % 20, lang weights, 64-dim embeddings, replicated
relational tables with offset keys) so optimization work can be validated at
the scale the driver actually measures.  Used ONLY for local measurement —
bench.py still defaults to /root/testdata/sf0.1 and nothing in the engine
reads this path.

Usage: python scripts/gen_tuning_sf.py [out_dir] [scale_vs_sf01]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array(
    "a agg batch big column customer data dup fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream table "
    "the value vector window".split()
)
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_W = np.array([0.41, 0.15, 0.15, 0.15, 0.14])


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    lens = rng.integers(10, 101, size=n)
    total = int(lens.sum())
    words = VOCAB[rng.integers(0, len(VOCAB), size=total)]
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(words[offs[i] : offs[i + 1]]) for i in range(n)]
    doc_id = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "doc_id": doc_id,
            "text": texts,
            "lang": LANGS[rng.choice(len(LANGS), size=n, p=LANG_W)],
            "source": np.char.add("src", (doc_id % 20).astype(str)),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    vecs = rng.standard_normal((n, 64)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
        }
    )


def replicate(src_path: str, n_copies: int, key_cols: dict) -> pa.Table:
    """Replicate a table n_copies times, offsetting each int key column by
    copy_index * its original cardinality bound so joins stay consistent."""
    t = pq.read_table(src_path)
    n = t.num_rows
    chunks = []
    for c in range(n_copies):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name in key_cols and c > 0:
                arr = col.to_numpy(zero_copy_only=False) + c * key_cols[name]
                cols[name] = pa.array(arr, type=col.type)
            else:
                cols[name] = col
        chunks.append(pa.table(cols))
    return pa.concat_tables(chunks)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/bigdata/sf1.0"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    pq.write_table(gen_documents(5000 * scale, rng), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(2000 * scale, rng), f"{out}/embeddings.parquet")

    # relational tables: replicate with key offsets (cardinalities from sf0.1)
    plans = {
        "customer": {"c_custkey": 15000},
        "orders": {"o_orderkey": 150000, "o_custkey": 15000},
        "lineitem": {"l_orderkey": 150000},
        "events": {"event_id": 100000, "user_id": 1500},
        "part": {"p_partkey": 20000} if os.path.exists(f"{src}/part.parquet") else {},
        "supplier": {"s_suppkey": 1000},
    }
    for name, keys in plans.items():
        path = f"{src}/{name}.parquet"
        if os.path.exists(path):
            pq.write_table(replicate(path, scale, keys), f"{out}/{name}.parquet")
    for name in ("nation", "region"):
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"), f"{out}/{name}.parquet")
    print("wrote", out)


if __name__ == "__main__":
    main()
