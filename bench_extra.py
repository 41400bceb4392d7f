#!/usr/bin/env python
"""Per-query isolation bench + plan capture (guide §1.4/§1.5, r6 tooling).

bench.py is FROZEN for measurement; this harness exists for optimization
work: it times any subset of registry queries through the same noop-sink
protocol, prints per-query walls, and can dump ``.explain("formatted")``
for each query to a directory (the plans/r06/ evidence files).

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf0.1 --queries pii_redact,corpus_clean
  python bench_extra.py --explain-dir plans/r06 --suffix _before --queries all
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apollo_service_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default="all", help="comma list or 'all' (= bench.py HEADLINE)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="", help="filename suffix for explain files")
    ap.add_argument("--no-time", action="store_true", help="only dump plans")
    args = ap.parse_args()

    heap = os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    spark = build_session(
        app_name="apollo-bench-extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
        extra_conf={
            "spark.driver.extraJavaOptions": f"-Xms{heap} -XX:+AlwaysPreTouch",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench as benchmod
    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    names = benchmod.HEADLINE if args.queries == "all" else args.queries.split(",")
    names = [n for n in names if n in registry]

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            df = registry[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.explain_dir, f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"# wrote {path}", file=sys.stderr)

    if args.no_time:
        spark.stop()
        return

    # worker pool + page cache warm (same as bench.py's rationale)
    import pandas as _pd  # noqa: F401

    spark.range(args.cpus * 4, numPartitions=args.cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        fn = registry[name]
        for _ in range(args.warmups):
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        spark.sparkContext._jvm.System.gc()
        walls = []
        for _ in range(args.repeats):
            t0 = time.monotonic()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        walls_sorted = sorted(walls)
        med = walls_sorted[len(walls_sorted) // 2]
        out[name] = {"median": med, "samples": walls}
        print(f"# {name}: median {med}s {walls}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
