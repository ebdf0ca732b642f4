"""Distributed, stateless WAL generator for benchmarking.

Unlike datagen.corpus.generate_wal (driver-side, stateful, oracle-friendly),
this generator is embarrassingly parallel: every event is a pure function of
(seed, epoch, i), so spark.range -> mapInPandas scales generation to any size.
Epoch 0 is all inserts over distinct page ids; later epochs are a U/no-op/D
mix over the same id space (duplicate pids within a batch exercise the LWW
stage). Content for (pid, version) is deterministic.
"""

from __future__ import annotations

import numpy as np

_VOCAB = np.array((
    "the quick brown fox jumps over lazy dog web page content crawl data "
    "lake spark merge chunk hash index stream table query filter join scan "
    "commit snapshot epoch event update insert delete schema column row"
).split())

EPOCH0_TS = "2025-01-01"


def _page_text_fast(pid: int, version: int, seed: int, avg_words: int) -> str:
    r = np.random.default_rng(np.array([seed, 0xB7, pid, version], dtype=np.uint64))
    n = int(r.integers(avg_words // 2, avg_words * 2))
    return " ".join(_VOCAB[r.integers(0, len(_VOCAB), n)])


def write_bench_wal(spark, out_dir: str, n_pages: int, events_per_epoch: int,
                    n_epochs: int = 2, seed: int = 42,
                    avg_words: int = 3000) -> int:
    """Write epoch-partitioned WAL parquet; returns total event count."""
    from pyspark.sql.types import (BinaryType, LongType, StringType,
                                   StructField, StructType, TimestampType)

    from .corpus import make_html

    schema = StructType([
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), False),
        StructField("op", StringType(), False),
        StructField("lsn", LongType(), False),
        StructField("epoch", LongType(), False),
    ])
    total = 0
    for ep in range(n_epochs):
        n_events = events_per_epoch if ep > 0 else min(n_pages, events_per_epoch)

        def gen(iterator, ep=ep):
            import pandas as pd
            base = pd.Timestamp(EPOCH0_TS)
            for pdf in iterator:
                rows = []
                for i in pdf["id"]:
                    i = int(i)
                    r = np.random.default_rng(
                        np.array([seed, 0xEE, ep, i], dtype=np.uint64))
                    late = False
                    if ep == 0:
                        pid, version, op = i, 0, "I"
                    else:
                        # CC-recrawl-shaped mix: most recrawls are unchanged
                        # (no-op), a minority changed, some deletes, some late
                        # re-deliveries of the previous epoch's version
                        pid = int(r.integers(0, n_pages))
                        roll = r.random()
                        if roll < 0.08:
                            version, op = ep - 1, "D"
                        elif roll < 0.38:
                            version, op = 0, "U"       # no-op recrawl of v0
                        elif roll < 0.43:
                            version, op, late = max(0, ep - 1), "U", True
                        else:
                            version, op = ep, "U"
                    url = f"https://site{pid % 64:03d}.example.com/page/{pid}"
                    lsn = ep * 10_000_000 + i
                    ts_ep = ep - 1 if late else ep
                    ts = base + pd.Timedelta(minutes=ts_ep * 2000 + (i % 1000))
                    if op == "D":
                        html, text = None, None
                    else:
                        text = _page_text_fast(pid, version, seed, avg_words)
                        html = make_html(url, text, "en")
                    rows.append((url, ts, html, text, "en", op, lsn, ep))
                yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

        (spark.range(n_events)
         .repartition(spark.sparkContext.defaultParallelism)
         .mapInPandas(gen, schema)
         .write.mode("overwrite").parquet(f"{out_dir}/epoch={ep:06d}"))
        total += n_events
    return total
