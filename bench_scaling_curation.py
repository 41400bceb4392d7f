#!/usr/bin/env python
"""Second-family scaling evidence: the curation inverted-index job at N vs 4N.

``bench_scaling.py`` evidences the north rule on the frontier superstep;
this runs the SAME protocol (interleaved rounds, taskset-pinned JVMs,
kernel-probe bracketing and acceptance, identical partition counts at both
levels) on the OTHER workload family this engine ships: the
duplicated-span inverted index (``curation.dup_span_stats`` shape — explode
overlapping word grams → 8-byte-hash map-side pre-combine → distinct-doc
counts → join back → per-doc reduce), which is also the skeleton of
``line_dedup``, ``ngram_jaccard``, ``decontaminate`` and
``dup_span_removal``.  A pipeline whose frontier scales but whose dedup
tier does not would still fail at 100 TB; this closes that gap in the
evidence.

Input is synthesized IN Spark (no external data): ``n_docs`` documents of
60 pseudo-words drawn deterministically from a 5000-word vocabulary via
integer hashing — large enough that gram duplication actually occurs (the
join-back path does real work), generated identically at both levels.

Probe/acceptance machinery is imported from ``bench_scaling`` so the two
artifacts can never drift methodologically.  Writes
``BENCH/SCALING_CURATION.md`` and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import (  # noqa: E402
    HEAP_PER_CORE_GB,
    KERNEL_AGREE,
    kernel_probe,
    sha_probe,
)

N_DOCS = int(os.environ.get("SCALING_CURATION_DOCS", "400000"))
WORDS_PER_DOC = 60
GRAM_WORDS = 4
VOCAB = 5000
WARMUPS = 2
REPEATS = 3
MIN_ROUNDS = int(os.environ.get("SCALING_CURATION_ROUNDS", "5"))
MAX_ROUNDS = MIN_ROUNDS + 3
MIN_ACCEPTED = 3


def _synth_docs(spark, n_docs: int):
    """(doc_id, text): 60 pseudo-words from a 5000-word vocab, deterministic
    integer hashing — identical at any parallelism."""
    from pyspark.sql import functions as F

    words = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
        lambda j: F.concat(
            F.lit("w"),
            (
                (F.col("id") * 2654435761 + j * 40503 + (F.col("id") + j) % 97)
                % VOCAB
            ).cast("string"),
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )


def _dup_span_job(docs):
    """The measured job: curation.dup_span_stats over the synthetic corpus,
    materialized through the noop sink — count() would let the optimizer
    eliminate the unique-key left join and column-prune the whole gram
    pipeline away (measured: 114M grams "processed" in 0.28 s — i.e. not
    processed at all)."""
    from apollo_service_spark.operators.curation import dup_span_stats

    out = dup_span_stats(docs, gram_words=GRAM_WORDS, max_dup_frac=0.2)
    out.write.format("noop").mode("overwrite").save()


def worker(cpus: int, n_docs: int) -> None:
    from apollo_service_spark.session import build_session

    heap = max(3, int(cpus * HEAP_PER_CORE_GB))
    spark = build_session(
        app_name=f"scaling-curation-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,  # identical at both levels (strong scaling)
        extra_conf={
            "spark.local.dir": "/dev/shm/spark-tmp",
            "spark.driver.memory": f"{heap}g",
            "spark.driver.extraJavaOptions": f"-Xms{heap}g -XX:+AlwaysPreTouch",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = _synth_docs(spark, n_docs).persist()
    docs.count()  # materialize input outside the timed region

    grams = n_docs * (WORDS_PER_DOC - GRAM_WORDS + 1)
    best = None
    for i in range(WARMUPS + REPEATS):
        t0 = time.monotonic()
        _dup_span_job(docs)
        wall = time.monotonic() - t0
        if i < WARMUPS:
            continue
        if best is None or wall < best["wall_s"]:
            best = {
                "cpus": cpus,
                "n_docs": n_docs,
                "grams": grams,
                "wall_s": round(wall, 3),
                "grams_per_sec": round(grams / wall),
            }
    print(json.dumps(best))
    spark.stop()


def _run_level(cpus: int, n_docs: int) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(cpus),
           "--n-docs", str(n_docs)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--worker", type=int, default=None)
    parser.add_argument("--n-docs", type=int, default=N_DOCS)
    args = parser.parse_args()

    if args.worker is not None:
        worker(args.worker, args.n_docs)
        return

    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    sha_start = sha_probe()
    best = {8: None, 32: None}
    rounds = []
    n_accepted = 0
    for _round in range(MAX_ROUNDS):
        load0 = os.getloadavg()
        k_pre = kernel_probe()
        e8 = _run_level(8, args.n_docs)
        k_mid = kernel_probe()
        e32 = _run_level(32, args.n_docs)
        k_post = kernel_probe()
        load1 = os.getloadavg()

        ks = [k_pre["speedup"], k_mid["speedup"], k_post["speedup"]]
        agree = max(ks) / min(ks)
        accepted = agree <= KERNEL_AGREE
        raw = e32["grams_per_sec"] / e8["grams_per_sec"]
        k_med = statistics.median(ks)
        rounds.append({
            "e8": e8["grams_per_sec"], "e32": e32["grams_per_sec"],
            "raw_speedup": round(raw, 3),
            "kernel_speedups": [round(k, 3) for k in ks],
            "kernel_agree": round(agree, 3),
            "paired_eff": round(raw / k_med, 3),
            "accepted": accepted,
            "loadavg": [round(load0[0], 2), round(load1[0], 2)],
        })
        for lvl, e in ((8, e8), (32, e32)):
            if best[lvl] is None or e["grams_per_sec"] > best[lvl]["grams_per_sec"]:
                best[lvl] = e
        n_accepted += accepted
        if _round + 1 >= MIN_ROUNDS and n_accepted >= MIN_ACCEPTED:
            break

    acc = [r for r in rounds if r["accepted"]]
    effs = sorted(r["paired_eff"] for r in acc) or [0.0]
    med_eff = effs[len(effs) // 2]
    raw_eff = (best[32]["grams_per_sec"] / best[8]["grams_per_sec"]) / 4
    result = {
        "workload": "curation_dup_span_inverted_index",
        "n_docs": args.n_docs,
        "grams_per_sec_8": best[8]["grams_per_sec"],
        "grams_per_sec_32": best[32]["grams_per_sec"],
        "median_paired_efficiency": round(med_eff, 3),
        "eff_min": effs[0], "eff_max": effs[-1],
        "absolute_eff": round(raw_eff, 3),
        "rounds_accepted": len(acc), "rounds_total": len(rounds),
        "sha_machine_speedup": round(sha_start["speedup"], 3),
        "criterion_pass": med_eff >= 0.8,
        "rounds": rounds,
    }
    with open("BENCH/SCALING_CURATION.json", "w") as f:
        json.dump(result, f, indent=1)
    with open("BENCH/SCALING_CURATION.md", "w") as f:
        f.write(
            "# Scaling evidence — curation inverted-index family\n\n"
            "Same protocol as BENCH/BASELINE.md (kernel-bracketed interleaved "
            "rounds,\ntaskset-pinned JVMs, identical partitioning at both "
            "levels), measured on the\nduplicated-span detection job "
            f"({args.n_docs} synthetic docs × {WORDS_PER_DOC} words, "
            f"{GRAM_WORDS}-word grams,\n5000-word vocab → real duplicate "
            "collisions).\n\n"
            f"- local[8]:  **{best[8]['grams_per_sec']:,} grams/s** "
            f"(best of {len(rounds)} rounds)\n"
            f"- local[32]: **{best[32]['grams_per_sec']:,} grams/s**\n"
            f"- median paired efficiency (kernel-normalized, accepted rounds "
            f"only): **{med_eff}**\n"
            f"- dispersion: {effs[0]} – {effs[-1]} over {len(acc)} accepted "
            f"/ {len(rounds)} rounds\n"
            f"- absolute N→4N efficiency (no normalization): {round(raw_eff, 3)}\n"
            f"- criterion (≥ 0.8): {'PASS' if med_eff >= 0.8 else 'FAIL'}\n\n"
            "Per-round detail in SCALING_CURATION.json.\n"
        )
    print(json.dumps({k: v for k, v in result.items() if k != "rounds"}))


if __name__ == "__main__":
    main()
