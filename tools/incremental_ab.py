"""A/B: per-epoch INCREMENTAL LSH dedup vs BATCH recompute over the
accumulated corpus — the timing evidence behind the O(epoch) claim in
operators/text_dedup.py:incremental_lsh_dup_pairs.

Corpus: /root/testdata/sf0.1 documents replicated ``--reps`` times with
salted ids and an id-suffix token (keeps each replica's internal near-dup
structure without creating corpus-wide identical-text buckets), split into
``--epochs`` equal epochs by id hash. Per epoch we time

  inc:   StreamingDedup.apply_batch (minhash the EPOCH, map-side probe of
         the persisted state parquet, write delta + marker)
  batch: lsh_duplicate_pairs over ALL docs arrived so far (what a
         non-incremental pipeline must re-run every ingest cycle)

Expected shape: inc stays ~flat per epoch; batch grows with the
accumulated corpus. Prints one JSON line with both time series.

Usage:
    taskset -c 24-31 python tools/incremental_ab.py [--reps 10]
        [--epochs 5] [--threshold 0.7]
"""

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from rust_chunking_spark.session import get_spark
from rust_chunking_spark.operators.text_dedup import lsh_duplicate_pairs
from rust_chunking_spark.streaming.dedup_stream import StreamingDedup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(app_name="incremental-ab", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n_base = docs.count()
    rep = spark.range(args.reps).select(F.col("id").alias("rep"))
    corpus = (docs.crossJoin(F.broadcast(rep))
              .select((F.col("doc_id") + F.col("rep") * n_base)
                      .alias("doc_id"),
                      F.concat_ws(" ", "text",
                                  F.concat(F.lit("rep"), "rep"))
                      .alias("text")))
    scratch = tempfile.mkdtemp(dir="/dev/shm", prefix="inc-ab-")
    out = {"n_docs": n_base * args.reps, "epochs": args.epochs,
           "threshold": args.threshold, "inc_s": [], "batch_s": [],
           "inc_pairs": [], "batch_pairs": []}
    try:
        corpus.write.mode("overwrite").parquet(f"{scratch}/corpus")
        corpus = spark.read.parquet(f"{scratch}/corpus")
        parts = [corpus.filter(
            F.pmod(F.xxhash64("doc_id"), args.epochs) == e)
            for e in range(args.epochs)]
        sd = StreamingDedup(spark, f"{scratch}/state", f"{scratch}/pairs",
                            threshold=args.threshold)
        for e in range(args.epochs):
            t0 = time.monotonic()
            sd.apply_batch(parts[e], e)
            out["inc_s"].append(round(time.monotonic() - t0, 2))
            out["inc_pairs"].append(sd.pairs().count())

            accumulated = corpus.filter(
                F.pmod(F.xxhash64("doc_id"), args.epochs) <= e)
            t0 = time.monotonic()
            n = lsh_duplicate_pairs(accumulated,
                                    threshold=args.threshold).count()
            out["batch_s"].append(round(time.monotonic() - t0, 2))
            out["batch_pairs"].append(n)
        # cross-check: cumulative incremental pair count == final batch
        out["pairs_equal"] = out["inc_pairs"][-1] == out["batch_pairs"][-1]
        out["batch_over_inc_last_epoch"] = round(
            out["batch_s"][-1] / out["inc_s"][-1], 2)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print("INC_AB_JSON " + json.dumps(out))


if __name__ == "__main__":
    main()
