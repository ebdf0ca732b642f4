"""Streaming front-end for incremental (CDC-native) near-dup detection.

Ties the two halves of this repo's dedup story together: documents arrive
as a stream (the file source stands in for a Kafka/CDC topic, same as
stream_ingest.py) and every micro-batch is deduplicated against the
PERSISTED LSH signature state via
:func:`~rust_chunking_spark.operators.text_dedup.incremental_lsh_dup_pairs`
— so a continuously-ingested corpus pays O(epoch) per epoch, never a
corpus-wide re-run.

State layout (all parquet, all append-shaped), under a GENERATION root
resolved through an atomically-replaced CURRENT pointer file — the same
crash-safe pattern as the lake's snapshot pointer (engine/lake.py):

    state_dir/CURRENT                        -> "gen-K" (absent = gen-0)
    state_dir/gen-K/sigs/batch=NNNNNN/       (id, sig)
    state_dir/gen-K/bands/batch=NNNNNN/      (id, band, bh)
    state_dir/gen-K/_COMMITTED_NNNNNN        per-batch commit marker
    pairs_dir/batch=NNNNNN/                  (a, b, est_jaccard, capped)

Exactly-once is the same two-layer contract as the ingest engine:
Spark's streaming checkpoint assigns each file to one micro-batch id, and
the commit marker makes re-delivery of a whole batch a no-op — a crash
between the parquet writes and the marker leaves orphan files that the
next attempt of the SAME batch id overwrites (mode="overwrite") and that
state loads never read (only marker-committed batch dirs are loaded,
mirroring the lake's orphan-snapshot rule).

CDC updates (a doc_id re-delivered with new text): within one batch the
operator itself supersedes the stale state rows (guarded anti-join). For
ids that were updated in an EARLIER batch, the one-live-signature-per-id
invariant is the persistence layer's job: construct with
``ids_may_update=True`` to load keep-latest state (one extra skinny
max_by aggregation of the state per batch — pay it only for update-heavy
topics), and/or run :meth:`compact` as stop-the-stream maintenance to
rewrite the state tree with exactly one generation of rows per id (the
analogue of the lake CLI's ``--compact-store``). Append-only streams need
neither.

Scale shape: per batch the state load is a parquet scan of skinny
columns, the probe is map-side (see incremental_lsh_dup_pairs), and the
persisted writes are the DELTA only (LshState.delta) — state persistence
is O(epoch), not O(corpus), which is what makes the loop viable at 100 TB
of accumulated corpus.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.text_dedup import LshState, incremental_lsh_dup_pairs


class StreamingDedup:
    """Incremental dedup over a document stream with parquet-persisted
    LSH state. Usable two ways: drive micro-batches yourself with
    :meth:`apply_batch` (a CDC orchestrator calling once per epoch), or
    attach to a Structured Streaming source with :meth:`start_stream`."""

    def __init__(self, spark: SparkSession, state_dir: str, pairs_dir: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 ids_may_update: bool = False, **lsh_kwargs):
        self.spark = spark
        self.state_dir = state_dir
        self.pairs_dir = pairs_dir
        self.id_col = id_col
        self.text_col = text_col
        self.ids_may_update = ids_may_update
        self.lsh_kwargs = lsh_kwargs
        os.makedirs(state_dir, exist_ok=True)
        os.makedirs(self._root(), exist_ok=True)
        os.makedirs(pairs_dir, exist_ok=True)

    # -------------------------------------------------------- generation

    def _current(self) -> str:
        cur = os.path.join(self.state_dir, "CURRENT")
        if os.path.exists(cur):
            with open(cur) as f:
                return f.read().strip()
        return "gen-0"

    def _root(self) -> str:
        return os.path.join(self.state_dir, self._current())

    def _flip_current(self, gen: str) -> None:
        tmp = os.path.join(self.state_dir, "CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(gen)
        os.replace(tmp, os.path.join(self.state_dir, "CURRENT"))

    # ------------------------------------------------------------- state

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self._root(), f"_COMMITTED_{batch_id:06d}")

    def committed_batches(self) -> list[int]:
        return sorted(
            int(f.rsplit("_", 1)[1]) for f in os.listdir(self._root())
            if f.startswith("_COMMITTED_"))

    @staticmethod
    def _has_parts(d: str) -> bool:
        # an EMPTY micro-batch (AQE: zero output partitions) can commit a
        # dir holding only _SUCCESS; reading it would fail schema inference
        return os.path.isdir(d) and any(
            f.endswith(".parquet") for f in os.listdir(d))

    def _load(self, sub: str, batches: list[int],
              with_batch: bool = False) -> DataFrame | None:
        base = os.path.join(self._root(), sub)
        dirs = [os.path.join(base, f"batch={b:06d}") for b in batches]
        dirs = [d for d in dirs if self._has_parts(d)]
        if not dirs:
            return None
        reader = self.spark.read
        if with_batch:
            # partition discovery materializes the batch=NNNNNN column —
            # the provenance keep-latest and compaction order by
            reader = reader.option("basePath", base)
        return reader.parquet(*dirs)

    def load_state(self) -> LshState | None:
        """State from marker-COMMITTED batches only: a crashed attempt's
        orphan parquet is invisible, exactly like the lake's
        CURRENT-pointer rule for orphan snapshots. With
        ``ids_may_update``, stale generations of re-delivered ids are
        dropped here (keep the row set of each id's LATEST batch)."""
        batches = self.committed_batches()
        if not self.ids_may_update or len(batches) <= 1:
            sigs = self._load("sigs", batches)
            bands = self._load("bands", batches)
            if sigs is None or bands is None:
                return None
            return LshState(sigs, bands)
        sigs = self._load("sigs", batches, with_batch=True)
        bands = self._load("bands", batches, with_batch=True)
        if sigs is None or bands is None:
            return None
        # one partial-aggregating pass fixes each id's live batch; bands
        # follow by a (id, batch) semi-join — both exchanges are skinny
        live = sigs.groupBy("id").agg(F.max("batch").alias("batch"))
        sigs = (sigs.join(live, ["id", "batch"], "left_semi")
                .select("id", "sig"))
        bands = (bands.join(live, ["id", "batch"], "left_semi")
                 .select("id", "band", "bh"))
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
        # materialize=False: the parquet write below IS the one
        # materialization of the pairs (an eager localCheckpoint first
        # would compute the result twice per micro-batch); the candidate
        # cache it leaves behind rides new_state.scratch and is released
        # with the rest of the epoch caches after the commit marker.
        pairs, new_state = incremental_lsh_dup_pairs(
            docs, state, id_col=self.id_col, text_col=self.text_col,
            materialize=False, **self.lsh_kwargs)
        tag = f"batch={batch_id:06d}"
        pairs.write.mode("overwrite").parquet(
            os.path.join(self.pairs_dir, tag))
        # delta only: O(epoch) persisted bytes per epoch
        new_state.delta.sigs.write.mode("overwrite").parquet(
            os.path.join(self._root(), "sigs", tag))
        new_state.delta.bands.write.mode("overwrite").parquet(
            os.path.join(self._root(), "bands", tag))
        with open(self._marker(batch_id), "w"):
            pass
        # the next batch re-loads state from parquet, so the cached epoch
        # signatures can be released now — without this every micro-batch
        # would pin two cached DataFrames for the life of the session
        new_state.unpersist()
        return True

    # -------------------------------------------------------- maintenance

    def compact(self) -> bool:
        """Stop-the-stream maintenance (the dedup analogue of the lake
        CLI's ``--compact-store``): rewrite the state as ONE batch dir
        holding each id's latest generation only — reclaiming the stale
        rows update-heavy streams accumulate and collapsing the
        many-small-files tree a long stream leaves behind.

        Crash safety is the lake's pointer protocol: the compacted tree
        is fully written under a NEW generation root, then CURRENT is
        atomically replaced; a crash before the flip leaves the old
        generation intact (the orphan new root is overwritten by the next
        compact), a crash after it leaves the new one live. Every
        ``gen-*`` directory other than CURRENT is swept at the END of a
        successful compact — not just this call's predecessor — so a
        generation orphaned by an earlier crash-after-flip is reclaimed
        on the next compact instead of leaking forever. Returns False
        when there is nothing to compact."""
        batches = self.committed_batches()
        if len(batches) <= 1:
            return False
        maxb = batches[-1]
        sigs = self._load("sigs", batches, with_batch=True)
        bands = self._load("bands", batches, with_batch=True)
        cur = self._current()
        new_gen = f"gen-{int(cur.rsplit('-', 1)[1]) + 1}"
        new_root = os.path.join(self.state_dir, new_gen)
        shutil.rmtree(new_root, ignore_errors=True)   # orphan of a crash
        tag = f"batch={maxb:06d}"
        if sigs is not None:
            live = sigs.groupBy("id").agg(F.max("batch").alias("batch"))
            (sigs.join(live, ["id", "batch"], "left_semi")
             .select("id", "sig")
             .write.mode("overwrite")
             .parquet(os.path.join(new_root, "sigs", tag)))
            if bands is not None:
                (bands.join(live, ["id", "batch"], "left_semi")
                 .select("id", "band", "bh")
                 .write.mode("overwrite")
                 .parquet(os.path.join(new_root, "bands", tag)))
        os.makedirs(new_root, exist_ok=True)
        # carry EVERY committed marker forward: the markers also gate
        # pairs(), whose per-batch dirs survive compaction untouched —
        # state loads are unaffected because they filter on existing
        # part dirs, of which the new generation has exactly one
        for b in batches:
            with open(os.path.join(new_root, f"_COMMITTED_{b:06d}"), "w"):
                pass
        self._flip_current(new_gen)
        # sweep EVERY stale generation, not just this call's predecessor:
        # a crash between a previous flip and its rmtree leaves gen-(K-1)
        # orphaned with CURRENT already pointing past it
        for entry in os.listdir(self.state_dir):
            if entry.startswith("gen-") and entry != new_gen:
                shutil.rmtree(os.path.join(self.state_dir, entry),
                              ignore_errors=True)
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
