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

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.ingest import CdcIngestJob


def start_stream_ingest(spark: SparkSession, job: CdcIngestJob, wal_dir: str,
                        checkpoint_dir: str, event_schema: str | None = None,
                        max_files_per_trigger: int = 64,
                        trigger_available_now: bool = True):
    """Start a streaming query applying WAL events through the merge engine.

    Epochs are derived from the `epoch` column of arriving events: each
    micro-batch may span epochs, so the batch is split and applied in epoch
    order, preserving the engine's per-epoch commit markers.
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
        for ep in epochs:
            job.apply_epoch(batch.filter(F.col("epoch") == ep), ep)

    writer = (stream.writeStream
              .foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
