"""Update-heavy StreamingDedup soak: the ids_may_update=True path at
scale, with a mid-stream compact(). Evidence for three claims the small
pytest can't make: (1) keep-latest state loading stays O(state) cheap as
generations accumulate, (2) compact() reclaims stale rows and the stream
continues over the compacted tree, (3) the one-live-signature-per-id
invariant holds at every step.

Corpus: sf0.1 documents replicated ``--reps`` times (salted ids/texts,
as tools/incremental_ab.py), split into ``--epochs`` epochs; from epoch 1
on, ``--update-frac`` of each epoch's rows are re-deliveries of ids from
EARLIER epochs (new salted text), i.e. CDC updates. Prints one JSON line.

Usage:
    taskset -c 24-31 python tools/update_soak.py [--reps 20] [--epochs 10]
        [--update-frac 0.3] [--compact-at 5]
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
from rust_chunking_spark.streaming.dedup_stream import StreamingDedup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--update-frac", type=float, default=0.3)
    ap.add_argument("--compact-at", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(app_name="update-soak", cpus=args.cpus,
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
    scratch = tempfile.mkdtemp(dir="/dev/shm", prefix="upd-soak-")
    out = {"n_docs": n_base * args.reps, "epochs": args.epochs,
           "update_frac": args.update_frac, "compact_at": args.compact_at,
           "epoch_s": [], "compact_s": None, "invariant_ok": True}
    try:
        corpus.write.mode("overwrite").parquet(f"{scratch}/corpus")
        corpus = spark.read.parquet(f"{scratch}/corpus")
        epoch_of = F.pmod(F.xxhash64("doc_id"), args.epochs)
        sd = StreamingDedup(spark, f"{scratch}/state", f"{scratch}/pairs",
                            ids_may_update=True, threshold=args.threshold)
        for e in range(args.epochs):
            fresh = corpus.filter(epoch_of == e)
            if e > 0 and args.update_frac > 0:
                # updates: earlier-epoch ids re-delivered with new text
                upd = (corpus.filter(epoch_of < e)
                       .filter(F.pmod(F.xxhash64("doc_id", F.lit(e)), 1000)
                               < int(args.update_frac * 1000
                                     / max(1, args.epochs - 1)))
                       .select("doc_id",
                               F.concat_ws(" ", "text",
                                           F.lit(f"updated e{e}"))
                               .alias("text")))
                batch = fresh.unionByName(upd)
            else:
                batch = fresh
            t0 = time.monotonic()
            sd.apply_batch(batch, e)
            out["epoch_s"].append(round(time.monotonic() - t0, 2))
            if e + 1 == args.compact_at:
                t0 = time.monotonic()
                sd.compact()
                out["compact_s"] = round(time.monotonic() - t0, 2)
        st = sd.load_state()
        n_sigs = st.sigs.count()
        n_ids = st.sigs.select("id").distinct().count()
        out["state_sigs"] = n_sigs
        out["invariant_ok"] = bool(n_sigs == n_ids)
        out["pairs_total"] = sd.pairs().count()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print("UPDATE_SOAK_JSON " + json.dumps(out))


if __name__ == "__main__":
    main()
