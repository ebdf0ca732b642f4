"""CDC ingest: WAL micro-batches -> exactly-once MERGE into the bucketed lake.

Per-epoch pipeline (north_star, BASELINE.json), engineered so WIDE rows (html)
are never shuffled — all decisions happen on skinny metadata:

  events(epoch)                                [source: parquet segment]
    -> LWW winners via SKINNY aggregate        [shuffle of (url,ts,lsn,uid)
       groupBy(url).max(struct(ts,lsn,uid))     ~60B/row, map-side combined]
    -> broadcast join-back to fetch wide rows  [map-side; no wide shuffle]
    -> content_fp = sha3(html) pandas UDF      [cheap; no chunking yet]
    -> decision join: winner meta vs lake meta [COLUMN-PRUNED read of dirty
       (url, warc_ts, lsn, content_fp,          buckets: html/text never leave
        deleted) — skinny left join]            the parquet file for this]
    -> verdicts: insert/update/delete/noop/skip_late/skip_duplicate
       (noop advances (warc_ts,lsn) metadata but skips content work)
    -> row assembly, all via broadcast semi/anti joins (map-side):
         content rows   = winners  ⋉ applied(insert|update)
         noop rows      = cur wide ⋉ noop urls, metadata overridden
         delete rows    = tombstones from meta
         carry rows     = cur wide anti-join applied urls (pass-through)
    -> chunk ONLY insert/update rows (round-robin repartition balances the
       pandas-UDF compute regardless of domain/url skew)
    -> chunk store: left_anti on hash -> append new chunks
    -> metrics + per-bucket lineage appended
    -> lake.overwrite_buckets(...)  [atomic snapshot flip = commit marker
       (epoch); replaying a committed epoch is a no-op => exactly-once]

Scale notes (100 TB): the only wide shuffles are the final bucket repartition
for the write and the fallback when a batch's winner set exceeds
``broadcast_limit`` (then Spark's SMJ + AQE skew split take over). Everything
else is map-side or skinny. The chunking UDF is the dominant compute and runs
only on truly-changed rows.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.chunking import (FP_CHUNK_SCHEMA, fingerprint_udf,
                                  sha3_256_udf)
from .lake import AppendOnlyTable, BucketedLake

SALT_BUCKETS = 16


@dataclasses.dataclass
class IngestMetrics:
    epoch: int
    events_seen: int = 0
    in_batch_superseded: int = 0
    applied_insert: int = 0
    applied_update: int = 0
    applied_delete: int = 0
    skipped_noop: int = 0
    skipped_late: int = 0
    skipped_duplicate: int = 0
    chunks_total: int = 0
    chunks_new: int = 0
    bytes_total: int = 0
    bytes_new: int = 0

    @property
    def dedup_ratio(self) -> float:
        return self.chunks_new / self.chunks_total if self.chunks_total else 1.0


class CdcIngestJob:
    def __init__(self, spark: SparkSession, lake: BucketedLake,
                 chunk_store: AppendOnlyTable, metrics: AppendOnlyTable,
                 algo: str = "super", chunk_params: dict | None = None,
                 salt_lww: bool = False, collect_metrics: bool = True,
                 broadcast_limit: int = 2_000_000):
        self.spark = spark
        self.lake = lake
        self.chunk_store = chunk_store
        self.metrics = metrics
        self.algo = algo
        self.chunk_params = chunk_params or {}
        self.salt_lww = salt_lww
        self.collect_metrics = collect_metrics
        self.broadcast_limit = broadcast_limit
        self.rows_chunked_acc = spark.sparkContext.accumulator(0)
        self._pending_lineage: list = []
        #: per-phase wall seconds of the most recent apply_epoch (observability)
        self.last_phase_timings: dict[str, float] = {}

    def _bcast(self, df: DataFrame, n_rows: int) -> DataFrame:
        """Broadcast hint while the side fits; beyond the limit let AQE pick
        (sort-merge + skew split) — the 10^10-event fallback."""
        return F.broadcast(df) if n_rows <= self.broadcast_limit else df

    # ------------------------------------------------------------ LWW stage

    @staticmethod
    def _with_uid(events: DataFrame) -> DataFrame:
        """Attach a tie-break uid that is stable under plan re-execution.

        The LWW join-back recomputes the event scan, so the uid MUST come out
        identical both times or winner rows are silently dropped. For file
        sources (the WAL) `_metadata.file_path + row_index` is a content- and
        partitioning-independent identity. Sources without `_metadata`
        (createDataFrame in tests, a future Kafka reader) fall back to
        monotonically_increasing_id, which is deterministic only when the
        source re-scans with identical partitioning — true for local
        relations and parquet; a Kafka-backed WalSource must instead expose
        (partition, offset) and pre-populate `__uid` before calling the engine.
        """
        if "__uid" in events.columns:
            return events
        try:
            return events.withColumn(
                "__uid", F.xxhash64(F.col("_metadata.file_path"),
                                    F.col("_metadata.row_index")))
        except Exception:
            return events.withColumn("__uid",
                                     F.monotonically_increasing_id())

    def _lww_latest(self, events: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Last-writer-wins by (warc_ts, lsn): skinny aggregate + join-back.

        Only (url, warc_ts, lsn, uid) ever enters the shuffle; winners' wide
        rows are fetched with a broadcast join-back. uid breaks ties between
        exact duplicate events (either copy is content-identical).

        salt_lww adds an (url, salt) pre-phase for pathologically hot single
        urls (millions of events for ONE key in a batch) where per-partition
        partial aggregation is not enough; AQE cannot split one reduce key.

        Returns (latest, keys, per_bucket_rows, n_winners); the per-bucket
        stats come from ONE driver action that doubles as the cache
        materialization for `keys` — the driver serial floor per epoch is a
        direct throughput tax at small batch sizes, so actions are fused
        wherever two of them read the same skinny aggregate.
        """
        ev = self._with_uid(events)
        key = F.struct(F.col("warc_ts"), F.col("lsn"), F.col("__uid"))
        skinny = ev.select("url", "warc_ts", "lsn", "__uid")
        if self.salt_lww:
            salted = skinny.withColumn(
                "__salt", F.pmod(F.xxhash64(F.col("__uid")), F.lit(SALT_BUCKETS)))
            p1 = (salted.groupBy("url", "__salt")
                  .agg(F.max(key).alias("k"), F.count("*").alias("cnt")))
            keys = (p1.groupBy("url")
                    .agg(F.max("k").alias("k"), F.sum("cnt").alias("n_events")))
        else:
            keys = (skinny.groupBy("url")
                    .agg(F.max(key).alias("k"), F.count("*").alias("n_events")))
        keys = keys.select("url", "k.*", "n_events").cache()
        # fused action: dirty buckets + batch totals + cache materialization
        per_bucket = (keys.groupBy(self.lake.bucket_expr().alias("b"))
                      .agg(F.sum("n_events").alias("seen"),
                           F.count("*").alias("winners")).collect())
        n_winners = int(sum(r.winners for r in per_bucket))
        latest = ev.join(
            self._bcast(keys.select("url", "__uid", "n_events"), n_winners),
            ["url", "__uid"], "inner").drop("__uid")
        return latest, keys, per_bucket, n_winners

    # ---------------------------------------------------------- epoch apply

    def apply_epoch(self, events: DataFrame, epoch: int) -> IngestMetrics | None:
        """Apply one WAL epoch with exactly-once semantics; None if already applied."""
        import time as _time

        t0 = _time.perf_counter()
        phases: dict[str, float] = {}

        def _mark(name: str) -> None:
            nonlocal t0
            now = _time.perf_counter()
            phases[name] = round(now - t0, 3)
            t0 = now

        if epoch in self.lake.committed_epochs():
            return None
        _mark("marker_check")
        m = IngestMetrics(epoch=epoch)

        # NOTE deliberately NO .cache() on any wide dataframe: materializing
        # 17KB-binary rows into the block manager anti-scales catastrophically
        # under many concurrent tasks (measured 65s vs 4s of compute at 32
        # threads). Wide rows are re-scanned from (page-cached) parquet with
        # column pruning instead; only skinny metadata is cached.
        latest, keys, per_bucket, n_winners = self._lww_latest(events)
        _mark("lww_collect")
        dirty = [int(r.b) for r in per_bucket]
        m.events_seen = int(sum(r.seen for r in per_bucket))
        m.in_batch_superseded = m.events_seen - n_winners

        # --- skinny decision join: column-pruned lake read (no html/text IO);
        # sha3 runs exactly once here, result lives in the skinny cache
        cur_wide = self.lake.read(self.spark, buckets=dirty)
        extras = [c for c in latest.columns
                  if c not in {"url", "warc_ts", "lsn", "op", "html", "text",
                               "lang", "__fp", "n_events", "epoch"}]
        ev_meta = latest.select(
            "url", F.col("warc_ts").alias("ev_warc_ts"),
            F.col("lsn").alias("ev_lsn"), F.col("op").alias("ev_op"),
            sha3_256_udf(F.col("html")).alias("ev_fp"),
            *[F.col(c).alias(f"ev_x_{c}") for c in extras])
        if cur_wide is None:
            decided = (ev_meta
                       .withColumn("cur_warc_ts", F.lit(None).cast("timestamp"))
                       .withColumn("cur_lsn", F.lit(None).cast("long"))
                       .withColumn("cur_fp", F.lit(None).cast("binary"))
                       .withColumn("cur_deleted", F.lit(None).cast("boolean"))
                       .withColumn("cur_exists", F.lit(False)))
        else:
            cur_meta = cur_wide.select(
                "url", F.col("warc_ts").alias("cur_warc_ts"),
                F.col("lsn").alias("cur_lsn"),
                F.col("content_fp").alias("cur_fp"),
                F.col("deleted").alias("cur_deleted"),
                F.lit(True).alias("cur_exists"))
            decided = (ev_meta.join(cur_meta, "url", "left")
                       .withColumn("cur_exists",
                                   F.coalesce(F.col("cur_exists"), F.lit(False))))
        decided = decided.withColumn("decision", self._decision_expr()).cache()

        # fused action: ONE collect of the per-(bucket, decision) lineage
        # materializes the decided cache, yields the verdict counts, AND is
        # the metrics payload — three driver round-trips folded into one.
        lineage_rows = (decided
                        .withColumn("bucket", self.lake.bucket_expr())
                        .groupBy("bucket", "decision")
                        .agg(F.count("*").alias("cnt"))
                        .withColumn("epoch", F.lit(epoch))
                        .collect())
        _mark("decide_collect")
        verdicts: dict[str, int] = {}
        for r in lineage_rows:
            verdicts[r.decision] = verdicts.get(r.decision, 0) + int(r.cnt)
        m.applied_insert = verdicts.get("insert", 0)
        m.applied_update = verdicts.get("update", 0)
        m.applied_delete = (verdicts.get("delete", 0)
                            + verdicts.get("delete_noexist", 0))
        m.skipped_noop = verdicts.get("noop", 0)
        m.skipped_late = verdicts.get("skip_late", 0)
        m.skipped_duplicate = verdicts.get("skip_duplicate", 0)

        new_rows, iu_urls = self._assemble_rows(latest, decided, cur_wide,
                                                n_winners, extras)

        self._append_metrics(lineage_rows, epoch)
        _mark("metrics_write")
        stats = {"__schema": new_rows.schema.json(),
                 **dataclasses.asdict(m)}
        merge_files = self.lake.overwrite_buckets(new_rows, dirty, epoch, stats)
        _mark("merge_write")

        # derive the chunk store from the just-written files: a column-pruned
        # read of (url, chunks) only — html never re-read. Crash between the
        # lake commit and this append is repaired by run() via snapshot stats.
        chunk_stats = self._update_chunk_store(merge_files, iu_urls, n_winners,
                                               epoch)
        _mark("chunk_store")
        m.chunks_total, m.chunks_new, m.bytes_total, m.bytes_new = chunk_stats
        decided.unpersist()
        keys.unpersist()
        self.last_phase_timings = phases
        return m

    # ------------------------------------------------------------- decisions

    @staticmethod
    def _decision_expr():
        ev_newer = (
            (F.col("ev_warc_ts") > F.col("cur_warc_ts"))
            | ((F.col("ev_warc_ts") == F.col("cur_warc_ts"))
               & (F.col("ev_lsn") > F.col("cur_lsn"))))
        ev_equal = ((F.col("ev_warc_ts") == F.col("cur_warc_ts"))
                    & (F.col("ev_lsn") == F.col("cur_lsn")))
        return (
            F.when(~F.col("cur_exists"),
                   F.when(F.col("ev_op") == "D", F.lit("delete_noexist"))
                   .otherwise(F.lit("insert")))
            .when(ev_equal, F.lit("skip_duplicate"))
            .when(~ev_newer, F.lit("skip_late"))
            .when(F.col("ev_op") == "D", F.lit("delete"))
            .when(F.col("cur_deleted"), F.lit("insert"))
            .when(F.col("ev_fp") == F.col("cur_fp"), F.lit("noop"))
            .otherwise(F.lit("update")))

    # ---------------------------------------------------------- row assembly

    def _assemble_rows(self, latest: DataFrame, decided: DataFrame,
                       cur_wide: DataFrame | None, n_winners: int,
                       extras: list[str]
                       ) -> tuple[DataFrame, DataFrame]:
        """Post-merge rows for the dirty buckets + the changed-content subset.

        Every join here is a broadcast semi/anti join on urls (map-side);
        wide rows stream straight from their source files to the writer.
        """
        applied_urls = (decided.filter(F.col("decision").isin(
            "insert", "update", "delete", "delete_noexist", "noop"))
            .select("url", "decision"))

        # content rows: winners with decision insert/update; the page
        # fingerprint rides in on the broadcast (sha3 is never recomputed)
        iu = (decided.filter(F.col("decision").isin("insert", "update"))
              .select("url", "ev_fp"))
        content = latest.join(self._bcast(iu, n_winners), "url", "inner")
        fp_udf = fingerprint_udf(self.algo, **self.chunk_params)
        content_rows = content.select(
            "url", "warc_ts", "lsn", "html", "text", "lang",
            F.col("ev_fp").alias("content_fp"), F.lit(False).alias("deleted"),
            fp_udf(F.col("html")).alias("chunks"),
            *extras)

        # tombstones (delete, delete_noexist): metadata only
        del_rows = (decided.filter(F.col("decision").isin(
            "delete", "delete_noexist"))
            .select("url", F.col("ev_warc_ts").alias("warc_ts"),
                    F.col("ev_lsn").alias("lsn"),
                    F.lit(None).cast("binary").alias("html"),
                    F.lit(None).cast("string").alias("text"),
                    F.lit(None).cast("string").alias("lang"),
                    F.lit(None).cast("binary").alias("content_fp"),
                    F.lit(True).alias("deleted"),
                    F.lit(None).cast(FP_CHUNK_SCHEMA).alias("chunks"),
                    *[F.lit(None).cast(latest.schema[c].dataType).alias(c)
                      for c in extras]))

        out = content_rows.unionByName(del_rows, allowMissingColumns=True)
        iu_urls = iu.select("url")
        if cur_wide is not None:
            # noop: current content; event metadata + extras advance
            noop_meta = (decided.filter(F.col("decision") == "noop")
                         .select("url", "ev_warc_ts", "ev_lsn",
                                 *[f"ev_x_{c}" for c in extras]))
            noop_rows = (cur_wide.join(self._bcast(noop_meta, n_winners),
                                       "url", "inner")
                         .withColumn("warc_ts", F.col("ev_warc_ts"))
                         .withColumn("lsn", F.col("ev_lsn")))
            for c in extras:
                noop_rows = noop_rows.withColumn(c, F.col(f"ev_x_{c}"))
            keep = list(dict.fromkeys(cur_wide.columns + extras))
            noop_rows = noop_rows.select(*keep)
            # carry: current rows not touched by an applied verdict
            carry = cur_wide.join(
                self._bcast(applied_urls.select("url"), n_winners),
                "url", "left_anti")
            out = (carry.unionByName(noop_rows, allowMissingColumns=True)
                   .unionByName(out, allowMissingColumns=True))

        return out, iu_urls

    # ------------------------------------------------------------ chunk store

    def _update_chunk_store(self, merge_files: list[str], iu_urls: DataFrame,
                            n_winners: int, epoch: int):
        acc = self.rows_chunked_acc
        if epoch in self.chunk_store.committed_epochs():
            return 0, 0, 0, 0
        written = self.lake.read_files(self.spark, merge_files)
        if written is None:
            self.chunk_store.append(
                self.spark.createDataFrame(
                    [], "chunk_hash binary, len long, first_seen_epoch long"),
                epoch)
            return 0, 0, 0, 0
        # column-pruned: only (url, chunks) leave the parquet files; restrict
        # to this epoch's freshly chunked rows (carry/noop chunks are already
        # in the store from prior epochs)
        chunked = (written.select("url", "chunks")
                   .join(self._bcast(iu_urls, n_winners), "url", "left_semi"))
        # one aggregation pass: per-hash (multiplicity, len) + seen-before flag
        uniq = (chunked.select(F.explode("chunks").alias("c"))
                .groupBy(F.col("c.hash").alias("chunk_hash"))
                .agg(F.count("*").alias("mult"), F.min("c.len").alias("len")))
        store = self.chunk_store.read(self.spark)
        if store is not None:
            uniq = uniq.join(store.select("chunk_hash")
                             .withColumn("__seen", F.lit(True)),
                             "chunk_hash", "left")
        else:
            uniq = uniq.withColumn("__seen", F.lit(None).cast("boolean"))
        is_new = F.col("__seen").isNull()
        if self.collect_metrics:
            uniq = uniq.cache()
            agg = uniq.agg(
                F.coalesce(F.sum("mult"), F.lit(0)).alias("total_n"),
                F.coalesce(F.sum(F.col("mult") * F.col("len")), F.lit(0)).alias("total_b"),
                F.coalesce(F.sum(F.when(is_new, 1).otherwise(0)), F.lit(0)).alias("new_n"),
                F.coalesce(F.sum(F.when(is_new, F.col("len")).otherwise(0)), F.lit(0)).alias("new_b"),
            ).collect()[0]
        new_chunks = (uniq.filter(is_new)
                      .select("chunk_hash", "len")
                      .withColumn("first_seen_epoch", F.lit(epoch)))
        self.chunk_store.append(new_chunks, epoch)
        if self.collect_metrics:
            uniq.unpersist()
            acc.add(int(agg.total_n))
            return int(agg.total_n), int(agg.new_n), int(agg.total_b), int(agg.new_b)
        return 0, 0, 0, 0

    # ---------------------------------------------------------------- metrics

    LINEAGE_SCHEMA = "bucket long, decision string, cnt long, epoch long"

    def _append_metrics(self, lineage_rows: list, epoch: int) -> None:
        """Write the already-collected lineage rows (tiny, driver-local).

        collect_metrics=False (steady-state) buffers rows and flushes them in
        one write at the end of the replay — per-epoch metric writes are pure
        serial floor.
        """
        if self.collect_metrics:
            self.metrics.append(
                self.spark.createDataFrame(lineage_rows, self.LINEAGE_SCHEMA),
                epoch)
        else:
            self._pending_lineage.append((epoch, lineage_rows))

    def flush_metrics(self) -> None:
        """Write lineage buffered by collect_metrics=False mode."""
        for epoch, rows in self._pending_lineage:
            if rows:
                self.metrics.append(
                    self.spark.createDataFrame(rows, self.LINEAGE_SCHEMA),
                    epoch)
        self._pending_lineage = []

    # ------------------------------------------------------------------- run

    def run(self, wal_dir: str, epochs: list[int]) -> list[IngestMetrics]:
        """Replay epochs from a WAL directory (one parquet dir per epoch);
        already-committed epochs are skipped (resume-from-checkpoint)."""
        import os

        out = []
        for ep in epochs:
            seg = os.path.join(wal_dir, f"epoch={ep:06d}")
            events = self.spark.read.parquet(seg)
            r = self.apply_epoch(events, ep)
            if r is not None:
                out.append(r)
            else:
                self._repair_chunk_store(ep)
        return out

    def _repair_chunk_store(self, epoch: int) -> None:
        """Crash between lake commit and chunk-store append: re-derive the
        epoch's chunk delta from the merge files recorded in snapshot stats."""
        if epoch in self.chunk_store.committed_epochs():
            return
        stats = self.lake.current_snapshot().get("stats", {}).get(str(epoch))
        if stats is None:
            return
        files = stats.get("merge_files", [])
        written = self.lake.read_files(self.spark, files)
        if written is None:
            self.chunk_store.append(
                self.spark.createDataFrame(
                    [], "chunk_hash binary, len long, first_seen_epoch long"),
                epoch)
            return
        # without the iu url list, dedup against the store covers carry rows
        uniq = (written.select(F.explode("chunks").alias("c"))
                .groupBy(F.col("c.hash").alias("chunk_hash"))
                .agg(F.min("c.len").alias("len")))
        store = self.chunk_store.read(self.spark)
        if store is not None:
            uniq = uniq.join(store.select("chunk_hash"), "chunk_hash",
                             "left_anti")
        self.chunk_store.append(
            uniq.withColumn("first_seen_epoch", F.lit(epoch)), epoch)
