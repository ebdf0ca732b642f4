"""10x-data soak: synthesize a 10x documents/embeddings/events scale-up of
sf0.1 (deterministic: union with offset ids), run every queries() entry at
both scales, and print a per-query time-ratio table for BENCH.md.

A query is scale-safe when its time ratio is ~sub-linear vs the 10x data
growth (32-way parallelism + aggregation trees absorb it); anything
super-linear is a plan bug. Usage:
    python tools/soak_10x.py [base_sf_dir] [factor] [query ...]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from rust_chunking_spark.session import get_spark

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
OUT = os.path.join(SCRATCH, f"soak-{os.path.basename(BASE)}-x{FACTOR}")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
# id columns to offset so the scale-up has distinct keys (others replicate)
OFFSETS = {
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
    "events": ("event_id", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
}


def build(spark):
    os.makedirs(OUT, exist_ok=True)
    for t in TABLES:
        dst = f"{OUT}/{t}.parquet"
        if os.path.exists(dst + "/_SUCCESS"):
            continue
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        if t in OFFSETS:
            col, step = OFFSETS[t]
            parts = [df.withColumn(col, F.col(col) + F.lit(i * step))
                     for i in range(FACTOR)]
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
        else:
            big = df   # dims stay as-is (joins still fan out via facts)
        big.write.mode("overwrite").parquet(dst)


def main():
    spark = get_spark(app_name="soak", cpus=32, shuffle_partitions=32)
    build(spark)
    # warm the UDF worker pool so the first chunking query isn't billed setup
    from rust_chunking_spark.functions.chunking import fingerprint_udf
    fp = fingerprint_udf("super")
    (spark.range(128).repartition(32)
     .select(fp(F.encode(F.repeat(F.col("id").cast("string"), 200),
                         "utf-8")).alias("c")).count())

    qs = entrymod.queries()
    if len(sys.argv) > 3:
        qs = {k: v for k, v in qs.items() if k in sys.argv[3:]}
    print(f"| query | {os.path.basename(BASE)} s | x{FACTOR} s | ratio |")
    print("|---|---|---|---|")
    worst = ("", 0.0)
    for name, fn in qs.items():
        ts = []
        for d in (BASE, OUT):
            t0 = time.perf_counter()
            fn(spark, d).count()
            ts.append(time.perf_counter() - t0)
        ratio = ts[1] / ts[0]
        if ratio > worst[1]:
            worst = (name, ratio)
        print(f"| {name} | {ts[0]:.2f} | {ts[1]:.2f} | {ratio:.2f}x |")
    print(f"\nworst ratio: {worst[0]} {worst[1]:.2f}x for {FACTOR}x data")
    spark.stop()


if __name__ == "__main__":
    main()
