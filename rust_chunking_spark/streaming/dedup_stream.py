"""Streaming front-end for incremental (CDC-native) near-dup detection.

Ties the two halves of this repo's dedup story together: documents arrive
as a stream (the file source stands in for a Kafka/CDC topic, same as
stream_ingest.py) and every micro-batch is deduplicated against the
PERSISTED LSH signature state via
:func:`~rust_chunking_spark.operators.text_dedup.incremental_lsh_dup_pairs`
— so a continuously-ingested corpus pays O(epoch) per epoch, never a
corpus-wide re-run.

State layout (all parquet, all append-shaped):

    state_dir/sigs/batch=NNNNNN/    (id, sig)      minhash signatures
    state_dir/bands/batch=NNNNNN/   (id, band, bh) LSH bucket rows
    state_dir/_COMMITTED_NNNNNN     per-batch commit marker
    pairs_dir/batch=NNNNNN/         (a, b, est_jaccard, capped)

Exactly-once is the same two-layer contract as the ingest engine
(engine/lake.py commit markers): Spark's streaming checkpoint assigns each
file to one micro-batch id, and the commit marker makes re-delivery of a
whole batch a no-op — a crash between the parquet writes and the marker
leaves orphan files that the next attempt of the SAME batch id overwrites
(mode="overwrite") and that state loads never read (only marker-committed
batch dirs are loaded, mirroring the lake's orphan-snapshot rule).

Scale shape: per batch the state load is a parquet scan of skinny
columns, the probe is map-side (see incremental_lsh_dup_pairs), and the
persisted writes are the DELTA only (LshState.delta) — state persistence
is O(epoch), not O(corpus), which is what makes the loop viable at 100 TB
of accumulated corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.text_dedup import LshState, incremental_lsh_dup_pairs


class StreamingDedup:
    """Incremental dedup over a document stream with parquet-persisted
    LSH state. Usable two ways: drive micro-batches yourself with
    :meth:`apply_batch` (a CDC orchestrator calling once per epoch), or
    attach to a Structured Streaming source with :meth:`start_stream`."""

    def __init__(self, spark: SparkSession, state_dir: str, pairs_dir: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 **lsh_kwargs):
        self.spark = spark
        self.state_dir = state_dir
        self.pairs_dir = pairs_dir
        self.id_col = id_col
        self.text_col = text_col
        self.lsh_kwargs = lsh_kwargs
        os.makedirs(state_dir, exist_ok=True)
        os.makedirs(pairs_dir, exist_ok=True)

    # ------------------------------------------------------------- state

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.state_dir, f"_COMMITTED_{batch_id:06d}")

    def committed_batches(self) -> list[int]:
        return sorted(
            int(f.rsplit("_", 1)[1]) for f in os.listdir(self.state_dir)
            if f.startswith("_COMMITTED_"))

    @staticmethod
    def _has_parts(d: str) -> bool:
        # an EMPTY micro-batch (AQE: zero output partitions) can commit a
        # dir holding only _SUCCESS; reading it would fail schema inference
        return os.path.isdir(d) and any(
            f.endswith(".parquet") for f in os.listdir(d))

    def _load(self, sub: str, batches: list[int]) -> DataFrame | None:
        dirs = [os.path.join(self.state_dir, sub, f"batch={b:06d}")
                for b in batches]
        dirs = [d for d in dirs if self._has_parts(d)]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def load_state(self) -> LshState | None:
        """State from marker-COMMITTED batches only: a crashed attempt's
        orphan parquet is invisible, exactly like the lake's
        CURRENT-pointer rule for orphan snapshots."""
        batches = self.committed_batches()
        sigs = self._load("sigs", batches)
        bands = self._load("bands", batches)
        if sigs is None or bands is None:
            return None
        return LshState(sigs, bands)

    def pairs(self) -> DataFrame | None:
        """All duplicate pairs found so far (committed batches only)."""
        dirs = [os.path.join(self.pairs_dir, f"batch={b:06d}")
                for b in self.committed_batches()]
        dirs = [d for d in dirs if self._has_parts(d)]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    # ------------------------------------------------------------- apply

    def apply_batch(self, docs: DataFrame, batch_id: int) -> bool:
        """Dedup one micro-batch against the persisted state; returns
        False if this batch id already committed (re-delivery no-op)."""
        if os.path.exists(self._marker(batch_id)):
            return False
        state = self.load_state()
        pairs, new_state = incremental_lsh_dup_pairs(
            docs, state, id_col=self.id_col, text_col=self.text_col,
            **self.lsh_kwargs)
        tag = f"batch={batch_id:06d}"
        pairs.write.mode("overwrite").parquet(
            os.path.join(self.pairs_dir, tag))
        # delta only: O(epoch) persisted bytes per epoch
        new_state.delta.sigs.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "sigs", tag))
        new_state.delta.bands.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "bands", tag))
        with open(self._marker(batch_id), "w"):
            pass
        return True

    # ------------------------------------------------------------ stream

    def start_stream(self, docs_dir: str, checkpoint_dir: str,
                     schema: str | None = None,
                     max_files_per_trigger: int = 64,
                     trigger_available_now: bool = True):
        """Attach to a parquet-file document stream. Batch boundaries do
        not affect the RESULT (the incremental==batch equivalence holds
        for any split of the corpus into epochs; each pair surfaces when
        its later member arrives), only when each pair surfaces."""
        reader = (self.spark.readStream.format("parquet")
                  .option("maxFilesPerTrigger", max_files_per_trigger))
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.schema(self.spark.read.parquet(docs_dir).schema)
        stream = reader.load(docs_dir)
        writer = (stream.writeStream
                  .foreachBatch(lambda df, bid: self.apply_batch(df, bid))
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
