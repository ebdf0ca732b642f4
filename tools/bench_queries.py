#!/usr/bin/env python
"""Per-query measurement harness for the optimization round (bench.py is
FROZEN for the driver's measurement; this file exists so guide §1's
"measure first" loop — isolate, explain, re-time — never touches it).

Methodology matches bench.py:query_bench exactly (same session factory,
same JVM + python-worker warm-up, same df.count() timing) so numbers are
comparable with BENCH_r07.json's queries map; adds per-query
.explain("formatted") capture and optional repeats / noop-sink isolation.

Usage:
  python tools/bench_queries.py --repeat 2 --plans-out plans/r08/before
  python tools/bench_queries.py --queries winnow_shared_pairs,minhash_dup_pairs
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="", help="comma-separated subset")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plans-out", default="", help="dir for explain files")
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink write (computes every column)")
    ap.add_argument("--jobs", action="store_true",
                    help="report Spark job count per query (fixed-overhead "
                         "diagnosis: driver actions are serial floor)")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from rust_chunking_spark.plans.inspect import explain_str
    from rust_chunking_spark.session import get_spark

    spark = get_spark(app_name="query-bench-extra", cpus=CPUS)
    sc = spark.sparkContext
    spark.range(1000).count()
    from pyspark.sql import functions as F
    from rust_chunking_spark.functions.chunking import fingerprint_udf
    fp = fingerprint_udf("super")
    warm = (spark.range(CPUS * 4).repartition(CPUS)
            .select(fp(F.encode(F.repeat(F.col("id").cast("string"), 200),
                                "utf-8")).alias("c"))
            .select(F.explode("c").alias("c"))
            .agg(F.count("*"), F.countDistinct("c.hash"), F.sum("c.len")))
    warm.collect()
    warm.collect()

    sel = set(args.queries.split(",")) if args.queries else None
    out = {}
    tracker = sc._jsc.sc().statusTracker() if args.jobs else None
    for name, fn in entrymod.queries().items():
        if sel is not None and name not in sel:
            continue
        sc.setJobDescription(f"bench: {name}")
        times = []
        jobs0 = len(tracker.getJobIdsForGroup(None)) if tracker else 0
        for rep in range(args.repeat):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            times.append(round(time.perf_counter() - t0, 3))
        rec = {"count_s": times, "rows": n}
        if args.jobs:
            alljobs = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
            rec["jobs_per_run"] = (len(alljobs) - jobs0) / args.repeat
        if args.noop:
            df = fn(spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            rec["noop_s"] = round(time.perf_counter() - t0, 3)
        if args.plans_out:
            os.makedirs(args.plans_out, exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(os.path.join(args.plans_out, f"{name}.txt"), "w") as f:
                f.write(explain_str(df, "formatted"))
        out[name] = rec
        print(f"{name}: {rec}", flush=True)
        sc.setJobDescription(None)
    print("BENCHQ_JSON:" + json.dumps(
        {"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
