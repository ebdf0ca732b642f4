"""CDC ingest: WAL micro-batches -> exactly-once MERGE into the bucketed lake.

Per-epoch pipeline (north_star, BASELINE.json):

  events(epoch)                                           [source: parquet segment]
    -> salted two-phase LWW max_by (url, salt) -> (url)   [explicit skew handling:
                                                           hot urls pre-aggregate
                                                           before the url shuffle]
    -> content_fp = sha3(html)                            [cheap; no chunking yet]
    -> full outer join with lake state, DIRTY BUCKETS ONLY [bucket pruning: O(delta)]
    -> decide: insert/update/delete/noop/skip_late/skip_duplicate
       (noop advances (warc_ts, lsn) metadata but skips content work —
        fingerprint-unchanged re-crawls cost no chunking and no chunk-store I/O)
    -> chunk ONLY insert/update rows (round-robin repartition balances the
       pandas-UDF compute regardless of domain skew)
    -> chunk store: left_anti on hash -> append new chunks
    -> metrics + per-bucket lineage appended
    -> lake.overwrite_buckets(...)  [atomic snapshot flip = commit marker
                                     (epoch); replay of a committed epoch is
                                     a no-op => exactly-once]

Scale notes: every join is url-equi (bucket-prunable); the only UDF runs on the
changed subset; AQE skew-join stays on as backstop; nothing ever collects rows
to the driver except tiny per-epoch count aggregates.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.chunking import fingerprint_udf, sha3_256_udf
from .lake import AppendOnlyTable, BucketedLake

LAKE_CONTENT_COLS = ["html", "text", "lang"]
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
                 salt_lww: bool = False, collect_metrics: bool = True):
        self.spark = spark
        self.lake = lake
        self.chunk_store = chunk_store
        self.metrics = metrics
        self.algo = algo
        self.chunk_params = chunk_params or {}
        self.salt_lww = salt_lww
        self.collect_metrics = collect_metrics
        self.rows_chunked_acc = spark.sparkContext.accumulator(0)

    # ------------------------------------------------------------ LWW stage

    def _lww_latest(self, events: DataFrame) -> DataFrame:
        """Last-writer-wins by (warc_ts, lsn) via max_by.

        Default: single groupBy(url) — the hash aggregate's map-side partial
        combine already reduces duplicate urls before the shuffle, so this is
        one full-data pass. salt_lww=True adds an explicit (url, salt)
        pre-phase for pathologically hot single urls (millions of events for
        one key in a batch), where even partial aggregation per input
        partition is not enough; AQE cannot split a single reduce key.
        """
        key = F.struct(F.col("warc_ts"), F.col("lsn"))
        ev = F.struct(*[F.col(c) for c in events.columns])
        if self.salt_lww:
            salted = events.withColumn(
                "__salt", F.pmod(F.xxhash64(F.col("lsn")), F.lit(SALT_BUCKETS)))
            phase1 = (salted.groupBy("url", "__salt")
                      .agg(F.max_by(ev, key).alias("ev"),
                           F.count("*").alias("cnt")))
            phase2 = (phase1.groupBy("url")
                      .agg(F.max_by("ev", F.struct(F.col("ev.warc_ts"),
                                                   F.col("ev.lsn"))).alias("ev"),
                           F.sum("cnt").alias("n_events")))
            return phase2.select("ev.*", "n_events")
        agg = (events.groupBy("url")
               .agg(F.max_by(ev, key).alias("ev"),
                    F.count("*").alias("n_events")))
        return agg.select("ev.*", "n_events")

    # ---------------------------------------------------------- epoch apply

    def apply_epoch(self, events: DataFrame, epoch: int) -> IngestMetrics | None:
        """Apply one WAL epoch with exactly-once semantics; None if already applied."""
        if epoch in self.lake.committed_epochs():
            return None
        m = IngestMetrics(epoch=epoch)

        latest = self._lww_latest(events).cache()
        # one action: dirty buckets + batch totals together
        per_bucket = (latest.groupBy(self.lake.bucket_expr().alias("b"))
                      .agg(F.sum("n_events").alias("seen"),
                           F.count("*").alias("winners")).collect())
        dirty = [int(r.b) for r in per_bucket]
        m.events_seen = int(sum(r.seen for r in per_bucket))
        m.in_batch_superseded = m.events_seen - int(sum(r.winners for r in per_bucket))

        # cheap page fingerprint for no-op detection (sha3 of html)
        latest = latest.withColumn("__fp", sha3_256_udf(F.col("html")))

        cur = self.lake.read(self.spark, buckets=dirty)
        decided = self._decide(latest, cur)
        decided = decided.cache()

        if self.collect_metrics:
            counts = {r["decision"]: r["cnt"] for r in
                      decided.groupBy("decision").agg(F.count("*").alias("cnt")).collect()}
            m.applied_insert = counts.get("insert", 0)
            m.applied_update = counts.get("update", 0)
            m.applied_delete = counts.get("delete", 0) + counts.get("delete_noexist", 0)
            m.skipped_noop = counts.get("noop", 0)
            m.skipped_late = counts.get("skip_late", 0)
            m.skipped_duplicate = counts.get("skip_duplicate", 0)

        new_rows = self._merge_rows(decided)

        # chunk only truly-changed content; round-robin balances UDF compute
        changed = (decided.filter(F.col("decision").isin("insert", "update"))
                   .select("url", "ev_html"))
        chunk_stats = self._update_chunk_store(changed, epoch)
        m.chunks_total, m.chunks_new, m.bytes_total, m.bytes_new = chunk_stats

        self._append_metrics(decided, m, epoch)

        schema_ddl = self._schema_ddl(new_rows)
        stats = {"__schema": schema_ddl, **{k: v for k, v in
                                            dataclasses.asdict(m).items()}}
        self.lake.overwrite_buckets(new_rows, dirty, epoch, stats)
        latest.unpersist()
        decided.unpersist()
        return m

    # ------------------------------------------------------------- decisions

    def _decide(self, latest: DataFrame, cur: DataFrame | None) -> DataFrame:
        ev = latest.select(
            F.col("url"),
            F.col("warc_ts").alias("ev_warc_ts"),
            F.col("lsn").alias("ev_lsn"),
            F.col("op").alias("ev_op"),
            F.col("html").alias("ev_html"),
            F.col("text").alias("ev_text"),
            F.col("lang").alias("ev_lang"),
            F.col("__fp").alias("ev_fp"),
            *[F.col(c).alias(f"ev_{c}") for c in latest.columns
              if c not in {"url", "warc_ts", "lsn", "op", "html", "text",
                           "lang", "__fp", "n_events", "epoch"}],
        )
        extra_ev_cols = [c for c in ev.columns
                         if c.startswith("ev_") and c not in
                         {"ev_warc_ts", "ev_lsn", "ev_op", "ev_html", "ev_text",
                          "ev_lang", "ev_fp"}]
        if cur is None:
            j = ev.withColumn("cur_url", F.lit(None).cast("string"))
            for c, t in [("warc_ts", "timestamp"), ("lsn", "long"),
                         ("html", "binary"), ("text", "string"),
                         ("lang", "string"), ("content_fp", "binary"),
                         ("deleted", "boolean")]:
                j = j.withColumn(f"cur_{c}", F.lit(None).cast(t))
            cur_extra = []
        else:
            cur_pref = cur.select(
                F.col("url").alias("cur_url"),
                *[F.col(c).alias(f"cur_{c}") for c in cur.columns if c != "url"])
            cur_extra = [c for c in cur_pref.columns if c not in
                         {"cur_url", "cur_warc_ts", "cur_lsn", "cur_html",
                          "cur_text", "cur_lang", "cur_content_fp", "cur_deleted"}]
            j = ev.join(cur_pref, ev.url == cur_pref.cur_url, "full_outer")

        ev_key_newer = (
            (F.col("ev_warc_ts") > F.col("cur_warc_ts"))
            | ((F.col("ev_warc_ts") == F.col("cur_warc_ts"))
               & (F.col("ev_lsn") > F.col("cur_lsn"))))
        ev_key_equal = ((F.col("ev_warc_ts") == F.col("cur_warc_ts"))
                        & (F.col("ev_lsn") == F.col("cur_lsn")))

        decision = (
            F.when(F.col("ev_lsn").isNull(), F.lit("carry"))
            .when(F.col("cur_url").isNull(),
                  F.when(F.col("ev_op") == "D", F.lit("delete_noexist"))
                  .otherwise(F.lit("insert")))
            .when(ev_key_equal, F.lit("skip_duplicate"))
            .when(~ev_key_newer, F.lit("skip_late"))
            .when(F.col("ev_op") == "D", F.lit("delete"))
            .when(F.col("cur_deleted"), F.lit("insert"))
            .when(F.col("ev_fp") == F.col("cur_content_fp"), F.lit("noop"))
            .otherwise(F.lit("update")))
        j = j.withColumn("decision", decision)
        j = j.withColumn("url", F.coalesce(F.col("url"), F.col("cur_url")))
        # remember extra (schema-evolution) column names for row construction
        j = j.withColumn("__extra_ev", F.lit(",".join(extra_ev_cols)))
        return j

    def _merge_rows(self, decided: DataFrame) -> DataFrame:
        """Build the post-merge rows for the dirty buckets."""
        extra_ev = [c[3:] for c in decided.columns
                    if c.startswith("ev_") and c not in
                    {"ev_warc_ts", "ev_lsn", "ev_op", "ev_html", "ev_text",
                     "ev_lang", "ev_fp"}]
        extra_cur = [c[4:] for c in decided.columns
                     if c.startswith("cur_") and c not in
                     {"cur_url", "cur_warc_ts", "cur_lsn", "cur_html",
                      "cur_text", "cur_lang", "cur_content_fp", "cur_deleted"}]
        extras = list(dict.fromkeys(extra_cur + extra_ev))

        applied = F.col("decision").isin("insert", "update", "delete",
                                         "delete_noexist", "noop")
        is_del = F.col("decision").isin("delete", "delete_noexist")
        is_content = F.col("decision").isin("insert", "update")

        def pick(col, cur_col, null_on_delete=True):
            expr = (F.when(is_content, F.col(col))
                    .when(F.col("decision") == "noop", F.col(cur_col)))
            if not null_on_delete:
                expr = expr.when(is_del, F.col(col))
            return expr.otherwise(F.col(cur_col))

        rows = decided.select(
            F.col("url"),
            F.when(applied, F.col("ev_warc_ts")).otherwise(F.col("cur_warc_ts"))
             .alias("warc_ts"),
            F.when(applied, F.col("ev_lsn")).otherwise(F.col("cur_lsn"))
             .alias("lsn"),
            F.when(is_del, F.lit(None).cast("binary"))
             .otherwise(pick("ev_html", "cur_html")).alias("html"),
            F.when(is_del, F.lit(None).cast("string"))
             .otherwise(pick("ev_text", "cur_text")).alias("text"),
            F.when(is_del, F.lit(None).cast("string"))
             .otherwise(pick("ev_lang", "cur_lang")).alias("lang"),
            F.when(is_del, F.lit(None).cast("binary"))
             .otherwise(F.when(is_content, F.col("ev_fp"))
                        .otherwise(F.col("cur_content_fp"))).alias("content_fp"),
            F.when(applied, is_del).otherwise(
                F.coalesce(F.col("cur_deleted"), F.lit(False))).alias("deleted"),
            *[
                F.when(applied & ~is_del,
                       F.col(f"ev_{c}") if f"ev_{c}" in decided.columns
                       else F.lit(None))
                .otherwise(F.col(f"cur_{c}") if f"cur_{c}" in decided.columns
                           else F.lit(None)).alias(c)
                for c in extras
            ],
        )
        return rows

    # ------------------------------------------------------------ chunk store

    def _update_chunk_store(self, changed: DataFrame, epoch: int):
        acc = self.rows_chunked_acc
        fp_udf = fingerprint_udf(self.algo, **self.chunk_params)

        n_parts = max(2, self.spark.sparkContext.defaultParallelism)
        chunked = (changed.repartition(n_parts)   # round-robin: balance UDF work
                   .withColumn("chunks", fp_udf(F.col("ev_html"))))
        # one aggregation pass: per-hash (multiplicity, len) with a seen-before
        # marker from the store; totals derived from the same collect
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

    def _append_metrics(self, decided: DataFrame, m: IngestMetrics,
                        epoch: int) -> None:
        lineage = (decided.filter(F.col("decision") != "carry")
                   .withColumn("bucket", self.lake.bucket_expr())
                   .groupBy("bucket", "decision")
                   .agg(F.count("*").alias("cnt"))
                   .withColumn("epoch", F.lit(epoch)))
        self.metrics.append(lineage, epoch)

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
        return out

    @staticmethod
    def _schema_ddl(df: DataFrame) -> str:
        return df.schema.json()
