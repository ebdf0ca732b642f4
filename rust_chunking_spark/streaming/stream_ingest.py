"""Structured Streaming front-end for the CDC ingest engine.

`readStream` tails the WAL directory as a file source (the sandbox stand-in
for a Kafka/binlog topic — swap `.format("parquet")` for `.format("kafka")`
plus a deserializer on a real deployment) and `foreachBatch` drives the SAME
exactly-once merge as batch replay (engine/ingest.py). Idempotence is
two-layer:

- Spark's streaming checkpoint guarantees each file lands in exactly one
  micro-batch id;
- the engine's committed-epoch markers make re-delivery of a whole batch
  (checkpoint rollback, manual replay) a no-op.

Watermark note: classic event-time watermarking drops late data; CDC-LWW
semantics instead *apply* late events idempotently (they lose the
(warc_ts, lsn) comparison), so no watermark is configured — late arrivals are
correct, not discarded (SURVEY.md §2.3 streaming row).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..engine.ingest import CdcIngestJob
from ..sources.wal import WalSource


def _max_epoch_on_disk(wal_dir: str) -> int | None:
    epochs = WalSource(wal_dir).epochs()
    return max(epochs) if epochs else None


def start_stream_ingest(spark: SparkSession, job: CdcIngestJob, wal_dir: str,
                        checkpoint_dir: str, event_schema: str | None = None,
                        max_files_per_trigger: int = 64,
                        trigger_available_now: bool = True):
    """Start a streaming query applying WAL events through the merge engine.

    Epochs named by the `epoch` column of arriving events are treated as
    TRIGGERS only: `maxFilesPerTrigger` batches *files*, not epochs, so a
    micro-batch can hold a partial slice of an epoch's part files. Applying
    that slice would commit the epoch marker and silently drop the rest of
    the epoch arriving in the next batch. Instead each triggered epoch is
    re-read in full from the WAL directory; the committed-epoch marker makes
    duplicate application a no-op, so exactly-once is preserved under
    re-delivery from either layer (checkpoint rollback or file re-listing).
    """
    reader = (spark.readStream.format("parquet")
              .option("maxFilesPerTrigger", max_files_per_trigger))
    if event_schema is not None:
        reader = reader.schema(event_schema)
    else:
        sample = spark.read.parquet(wal_dir)
        reader = reader.schema(sample.schema)
    stream = reader.load(wal_dir)

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        epochs = [int(r[0]) for r in
                  batch.select("epoch").distinct().orderBy("epoch").collect()]
        max_on_disk = _max_epoch_on_disk(wal_dir)
        for ep in epochs:
            seg = os.path.join(wal_dir, f"epoch={ep:06d}")
            # An epoch is safe to apply only once its writer is done: its
            # _SUCCESS marker exists, or a later epoch segment already exists
            # (the WAL writer is epoch-ordered). Otherwise defer — the
            # epoch's remaining files will trigger a later micro-batch.
            closed = (os.path.exists(os.path.join(seg, "_SUCCESS"))
                      or (max_on_disk is not None and max_on_disk > ep))
            if not closed:
                continue
            events = spark.read.parquet(seg)
            if job.apply_epoch(events, ep) is None:
                # Already committed to the lake (re-delivery or a crash
                # between the lake commit and the chunk-store append): make
                # sure the derived chunk store catches up, mirroring
                # CdcIngestJob.run.
                job._repair_chunk_store(ep)

    writer = (stream.writeStream
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
