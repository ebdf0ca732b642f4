"""BucketedLake — an Iceberg-style table: snapshot isolation, atomic commits,
bucket-pruned MERGE, additive schema evolution, committed-epoch markers.

The sandbox has no Iceberg runtime jar, so the same semantics are implemented
on parquet (SURVEY.md §7.4 keeps MERGE behind one sink interface; on a real
cluster this class is swapped for `MERGE INTO iceberg.db.pages`):

- Data files are immutable parquet files assigned to url-hash buckets
  (pmod(xxhash64(url), n_buckets) — same layout as Iceberg `bucket(N, url)`).
- A snapshot (JSON) lists the live files per bucket + the set of committed
  epochs; `CURRENT` is flipped by atomic os.replace — readers see either the
  old or the new snapshot, never a partial write (exactly-once commit point).
- MERGE rewrites only *dirty* buckets (buckets containing changed urls); clean
  buckets carry over by reference. At 100 TB this is the difference between
  an O(table) rewrite and an O(delta) one.
- Schema evolution is additive: the snapshot stores the widest schema; readers
  unionByName(allowMissingColumns=True) so old files yield nulls for new
  columns (Iceberg metadata evolution equivalent).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class BucketedLake:
    def __init__(self, path: str, key_col: str = "url", n_buckets: int = 32):
        self.path = path
        self.key_col = key_col
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)
        # The bucket spec is TABLE metadata, not caller opinion (Iceberg
        # partition-spec semantics): an existing lake's persisted count wins
        # over the constructor arg — reopening a 32-bucket lake with
        # n_buckets=64 would otherwise silently mis-route every key. New
        # lakes record the ctor value at first commit; `rebucket()` is the
        # only way to change it.
        snap = self.current_snapshot()
        persisted = snap.get("n_buckets")
        if persisted is not None:
            # mirror rebucket()'s new_n >= 1 check: a manifest carrying a
            # nonsensical bucket count must fail loudly, not silently turn
            # bucket_expr into pmod(x, 0) = null routing (ADVICE r4 #3)
            if int(persisted) < 1:
                raise ValueError(
                    f"{path} persists n_buckets={persisted}; not a "
                    f"bucketed-lake manifest (append-only table dir?)")
            self.n_buckets = int(persisted)
        # Lake MODE is table metadata too: opening a COW lake through the
        # MoR class (or vice versa) reads the wrong file sets — harmless
        # for reads (empty result) but catastrophic for maintenance ops
        # (a mismatched rebucket would commit an empty rewrite over a
        # non-empty snapshot). Fail loudly instead.
        pmode = snap.get("mor")
        mine = bool(getattr(self, "MOR", False))
        if pmode is not None and bool(pmode) != mine:
            raise ValueError(
                f"{path} is a {'MoR' if pmode else 'COW'} lake; open it "
                f"with {'MorBucketedLake' if pmode else 'BucketedLake'} "
                f"(--mode {'mor' if pmode else 'cow'})")
        # ctor-arg validation, same loudness as the manifest guard above:
        # n_buckets < 1 makes bucket_expr pmod(x, 0) = null-route every row
        # into a __HIVE_DEFAULT_PARTITION__ with no error. (AppendOnlyTable's
        # inner lake bypasses __init__ via __new__, so this cannot fire
        # for it.)
        if self.n_buckets < 1:
            raise ValueError(
                f"n_buckets={self.n_buckets} must be >= 1 for {path}")

    # ------------------------------------------------------------- snapshots

    @property
    def _current_path(self) -> str:
        return os.path.join(self.path, "snapshots", "CURRENT")

    def current_snapshot(self) -> dict:
        try:
            with open(self._current_path) as f:
                name = f.read().strip()
            with open(os.path.join(self.path, "snapshots", name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": 0, "files": {}, "committed_epochs": [],
                    "schema": None, "stats": {}}

    def committed_epochs(self) -> set[int]:
        return set(self.current_snapshot()["committed_epochs"])

    def _commit(self, snap: dict) -> None:
        # bucket spec + lake mode are table metadata, stamped on every
        # commit — but only for REAL bucketed lakes: AppendOnlyTable commits
        # through a __new__-constructed inner lake with n_buckets=0, and
        # persisting that 0 would poison any later adoption of the manifest
        # as a BucketedLake (ADVICE r4 #3)
        if self.n_buckets >= 1:
            snap["n_buckets"] = self.n_buckets
            snap["mor"] = bool(getattr(self, "MOR", False))
        name = f"v{snap['version']:08d}.json"
        with open(os.path.join(self.path, "snapshots", name), "w") as f:
            json.dump(snap, f)
        tmp = self._current_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(name)
        os.replace(tmp, self._current_path)   # atomic flip = the commit point

    # ----------------------------------------------------------------- reads

    def read(self, spark: SparkSession, buckets: list[int] | None = None
             ) -> DataFrame | None:
        """Current table state; `buckets` prunes to the named buckets only."""
        snap = self.current_snapshot()
        files: list[str] = []
        sel = snap["files"]
        if buckets is not None:
            sel = {str(b): sel.get(str(b), []) for b in buckets}
        for fl in sel.values():
            files.extend(fl)
        schema = self._schema_from_json(snap["schema"])
        if not files:
            if schema is None:
                return None
            return spark.createDataFrame([], schema)
        df = (spark.read.option("mergeSchema", "true")
              .parquet(*[os.path.join(self.path, "data", f) for f in files]))
        if schema is not None:
            empty = spark.createDataFrame([], schema)
            df = df.unionByName(empty, allowMissingColumns=True)
            # reorder/extend to the table schema (additive evolution)
            df = df.select(*[F.col(c) for c in empty.columns])
        return df

    @staticmethod
    def _schema_from_json(sj):
        if sj is None:
            return None
        from pyspark.sql.types import StructType
        return StructType.fromJson(json.loads(sj))

    # ---------------------------------------------------------------- writes

    def bucket_expr(self):
        return F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets))

    def overwrite_buckets(self, df: DataFrame, dirty_buckets: list[int],
                          epoch: int, stats: dict | None = None) -> list[str]:
        """MERGE commit: replace the named buckets with df's rows, atomically.

        df must contain only rows whose bucket is in dirty_buckets. Rows are
        written one parquet directory per bucket so later reads prune cleanly.
        Returns the relative paths written this merge (also recorded in the
        snapshot stats as ``merge_files`` for crash repair of derived tables).
        """
        snap = self.current_snapshot()
        new_files = dict(snap["files"])
        token = f"e{epoch:06d}-{uuid.uuid4().hex[:8]}"
        staged = df.withColumn("__bucket", self.bucket_expr())
        out_dir = os.path.join(self.path, "data", f"merge-{token}")
        (staged.repartition(max(1, len(dirty_buckets)), "__bucket")
               .write.partitionBy("__bucket").mode("overwrite").parquet(out_dir))
        written = {}
        for entry in os.listdir(out_dir):
            if entry.startswith("__bucket="):
                b = int(entry.split("=", 1)[1])
                written[b] = [f"merge-{token}/{entry}"]
        for b in dirty_buckets:
            new_files[str(b)] = written.get(b, [])   # empty bucket -> no files
        merge_files = [f for fl in written.values() for f in fl]
        stats = dict(stats or {})
        schema = stats.pop("__schema", snap["schema"])
        stats["merge_files"] = merge_files
        snap2 = {
            "version": snap["version"] + 1,
            "files": new_files,
            "committed_epochs": sorted(set(snap["committed_epochs"]) | {epoch}),
            "schema": schema,
            "stats": {**snap.get("stats", {}), str(epoch): stats},
            "ts": time.time(),
        }
        self._commit(snap2)
        return merge_files

    def read_files(self, spark: SparkSession, rel_files: list[str]
                   ) -> DataFrame | None:
        if not rel_files:
            return None
        return spark.read.parquet(
            *[os.path.join(self.path, "data", f) for f in rel_files])

    # ------------------------------------------------------- maintenance

    def _current_version(self) -> int | None:
        """Version number named by the CURRENT pointer (None before any commit)."""
        try:
            with open(self._current_path) as f:
                name = f.read().strip()
            return int(name[1:-5])
        except (FileNotFoundError, ValueError):
            return None

    def snapshot_versions(self) -> list[int]:
        out = []
        for entry in sorted(os.listdir(os.path.join(self.path, "snapshots"))):
            if entry.startswith("v") and entry.endswith(".json"):
                out.append(int(entry[1:-5]))
        return out

    def read_version(self, spark: SparkSession, version: int
                     ) -> DataFrame | None:
        """Time travel: read the table as of a specific snapshot version."""
        with open(os.path.join(self.path, "snapshots",
                               f"v{version:08d}.json")) as f:
            snap = json.load(f)
        files = [f for fl in snap["files"].values() for f in fl]
        schema = self._schema_from_json(snap["schema"])
        if not files:
            return spark.createDataFrame([], schema) if schema else None
        df = (spark.read.option("mergeSchema", "true")
              .parquet(*[os.path.join(self.path, "data", f) for f in files]))
        if schema is not None:
            empty = spark.createDataFrame([], schema)
            df = df.unionByName(empty, allowMissingColumns=True)
            df = df.select(*[F.col(c) for c in empty.columns])
        return df

    def compact(self, spark: SparkSession, target_files_per_bucket: int = 1
                ) -> int:
        """Rewrite buckets whose file count exceeds the target into one file
        each; commits a new snapshot (no logical change). Returns number of
        buckets compacted."""
        snap = self.current_snapshot()
        over = [int(b) for b, fl in snap["files"].items()
                if len(fl) > target_files_per_bucket]
        if not over:
            return 0
        df = self.read(spark, buckets=over)
        token = f"compact-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.path, "data", f"merge-{token}")
        staged = df.withColumn("__bucket", self.bucket_expr())
        (staged.repartition(len(over), "__bucket")
               .write.partitionBy("__bucket").mode("overwrite").parquet(out_dir))
        new_files = dict(snap["files"])
        for entry in os.listdir(out_dir):
            if entry.startswith("__bucket="):
                b = int(entry.split("=", 1)[1])
                new_files[str(b)] = [f"merge-{token}/{entry}"]
        self._commit({**snap, "version": snap["version"] + 1,
                      "files": new_files, "ts": time.time()})
        return len(over)

    def rebucket(self, spark: SparkSession, new_n: int) -> int:
        """Partition-spec evolution: rewrite the table under
        ``pmod(xxhash64(key), new_n)`` and commit a snapshot carrying the
        new spec (VERDICT r3 missing #1 — at 10^10 events 32 buckets is far
        too coarse, and without this op a 100x operator would rebuild the
        lake by hand). Committed epochs, schema, and stats carry over;
        subsequent epochs' dirty-bucket sets use the new spec (bucket_expr
        reads self.n_buckets, and reopening adopts the persisted value).
        One full-table rewrite — a maintenance op, amortized over the
        epochs it saves, exactly like Iceberg's spec-evolution rewrite.
        Returns the previous bucket count. Old data dirs become unreferenced
        and are collected by expire_snapshots."""
        if new_n < 1:
            raise ValueError(f"new_n must be >= 1, got {new_n}")
        snap = self.current_snapshot()
        if new_n == self.n_buckets:
            return self.n_buckets
        df = self.read(spark)
        old_n, self.n_buckets = self.n_buckets, new_n
        new_files: dict[str, list[str]] = {}
        if df is not None:
            token = f"rebucket-{uuid.uuid4().hex[:8]}"
            out_dir = os.path.join(self.path, "data", f"merge-{token}")
            (df.withColumn("__bucket", self.bucket_expr())
             .repartition(new_n, "__bucket")
             .write.partitionBy("__bucket").mode("overwrite").parquet(out_dir))
            for entry in os.listdir(out_dir):
                if entry.startswith("__bucket="):
                    b = entry.split("=", 1)[1]
                    new_files[b] = [f"merge-{token}/{entry}"]
        self._commit({**snap, "version": snap["version"] + 1,
                      "files": new_files, "ts": time.time()})
        return old_n

    def expire_snapshots(self, keep_last: int = 2) -> int:
        """Drop old snapshot manifests and any data file no kept snapshot
        references (Iceberg expire_snapshots + orphan cleanup). Returns the
        number of data directories removed.

        The snapshot CURRENT references is always kept, whatever its version
        number: after a crash between writing vN.json and the atomic CURRENT
        flip, vN is an orphan *newer* than CURRENT — counting it toward
        ``keep_last`` (or worse, keeping only it) would delete the manifest
        and data the table actually lives on. Orphans newer than CURRENT are
        expired like any other non-current manifest.
        """
        import shutil

        versions = self.snapshot_versions()
        current_v = self._current_version()
        committed = (versions if current_v is None
                     else [v for v in versions if v <= current_v])
        keep = set(committed[-keep_last:])
        if current_v is not None:
            keep.add(current_v)
        live: set[str] = set()
        for v in keep:
            with open(os.path.join(self.path, "snapshots",
                                   f"v{v:08d}.json")) as f:
                snap = json.load(f)
            for fl in snap["files"].values():
                live.update(f.split("/")[0] for f in fl)
            # MoR lakes also reference skinny meta directories
            for fl in snap.get("meta_files", {}).values():
                live.update(f.split("/")[0] for f in fl)
        removed = 0
        data_dir = os.path.join(self.path, "data")
        for entry in os.listdir(data_dir):
            if entry not in live:
                shutil.rmtree(os.path.join(data_dir, entry),
                              ignore_errors=True)
                removed += 1
        for v in versions:
            if v not in keep:
                os.remove(os.path.join(self.path, "snapshots",
                                       f"v{v:08d}.json"))
        return removed

    def init_schema(self, schema_ddl: str) -> None:
        snap = self.current_snapshot()
        if snap["schema"] is None:
            snap = {**snap, "version": snap["version"] + 1, "schema": schema_ddl}
            self._commit(snap)

    def evolve_schema(self, schema_ddl: str) -> None:
        """Additive evolution: record the widened schema in table metadata."""
        snap = self.current_snapshot()
        snap = {**snap, "version": snap["version"] + 1, "schema": schema_ddl}
        self._commit(snap)


class MorBucketedLake(BucketedLake):
    """Merge-on-read variant (Iceberg MoR equivalent) of the bucketed lake.

    The COW lake rewrites every dirty bucket's WIDE rows each MERGE — at a
    Common-Crawl change rate that is an O(table) html rewrite per epoch, and
    it is exactly the bandwidth-bound stage that dominates replay time. MoR
    splits the table:

    - **meta (skinny, copy-on-write)**: one row per url — current
      (warc_ts, lsn), a content pointer (content_ts, content_lsn) naming the
      wide row that holds the current payload, content_fp, deleted, plus any
      additively-evolved event columns. ~100 B/row, so per-epoch bucket
      rewrites stay cheap at any scale.
    - **wide (append-only deltas)**: immutable parquet per epoch per bucket
      holding ONLY freshly-chunked insert/update rows. No carry/noop rewrite:
      ingest IO is O(changed bytes), not O(table bytes).

    Reads reconstruct current rows by joining wide deltas to the meta
    pointers (url, content_ts, content_lsn) — the classic MoR read
    amplification, bounded by `compact()`, which folds a bucket's deltas
    into one file. Snapshot/commit/expire/time-travel machinery is inherited
    unchanged: one manifest lists both file sets, and the atomic CURRENT
    flip commits them together (exactly-once).
    """

    MOR = True
    #: wide delta schema (content rows only; warc_ts/lsn here are the CONTENT
    #: version keys the meta pointer references)
    WIDE_COLS = ["url", "warc_ts", "lsn", "html", "text", "lang",
                 "content_fp", "chunks"]

    # ------------------------------------------------------------------ meta

    def read_meta(self, spark: SparkSession, buckets: list[int] | None = None
                  ) -> DataFrame | None:
        """Current skinny state (url -> LWW metadata + content pointer)."""
        snap = self.current_snapshot()
        sel = snap.get("meta_files", {})
        if buckets is not None:
            sel = {str(b): sel.get(str(b), []) for b in buckets}
        files = [f for fl in sel.values() for f in fl]
        schema = self._schema_from_json(snap.get("meta_schema"))
        if not files:
            if schema is None:
                return None
            return spark.createDataFrame([], schema)
        df = (spark.read.option("mergeSchema", "true")
              .parquet(*[os.path.join(self.path, "data", f) for f in files]))
        if schema is not None:
            empty = spark.createDataFrame([], schema)
            df = df.unionByName(empty, allowMissingColumns=True)
            df = df.select(*[F.col(c) for c in empty.columns])
        return df

    # ----------------------------------------------------------------- write

    def write_delta(self, wide_rows: DataFrame, dirty_buckets: list[int],
                    epoch: int) -> list[str]:
        """Write the epoch's wide content delta WITHOUT committing (files are
        invisible until ``commit_delta`` flips the snapshot; a crash in
        between leaves orphans that ``expire_snapshots`` collects). The split
        lets the engine read the just-written files (their skinny columns)
        to finish no-op decisions before committing — one wide pass total."""
        token = f"e{epoch:06d}-{uuid.uuid4().hex[:8]}"
        n_part = max(1, len(dirty_buckets))
        wide_dir = os.path.join(self.path, "data", f"delta-{token}")
        (wide_rows.withColumn("__bucket", self.bucket_expr())
         .repartition(n_part, "__bucket")
         .write.partitionBy("__bucket").mode("overwrite").parquet(wide_dir))
        return [f"delta-{token}/{e}" for e in os.listdir(wide_dir)
                if e.startswith("__bucket=")]

    def commit_delta(self, written: list[str], meta_rows: DataFrame,
                     dirty_buckets: list[int], epoch: int,
                     stats: dict | None = None) -> list[str]:
        """Atomically commit previously-written wide delta files + the dirty
        buckets' new skinny meta in one snapshot flip.

        `stats` may be a zero-arg callable, evaluated after the meta write
        but before the snapshot flip — the hook the engine uses to harvest
        observation metrics from the write job itself (no extra action) while
        still landing real verdict counts in the committed stats."""
        snap = self.current_snapshot()
        token = f"e{epoch:06d}-{uuid.uuid4().hex[:8]}"
        n_part = max(1, len(dirty_buckets))
        new_files = dict(snap["files"])
        for rel in written:
            b = rel.split("__bucket=", 1)[1]
            new_files.setdefault(b, [])
            new_files[b] = new_files[b] + [rel]          # APPEND, not replace

        meta_dir = os.path.join(self.path, "data", f"meta-{token}")
        (meta_rows.withColumn("__bucket", self.bucket_expr())
         .repartition(n_part, "__bucket")
         .write.partitionBy("__bucket").mode("overwrite").parquet(meta_dir))
        meta_files = dict(snap.get("meta_files", {}))
        for entry in os.listdir(meta_dir):
            if entry.startswith("__bucket="):
                b = int(entry.split("=", 1)[1])
                meta_files[str(b)] = [f"meta-{token}/{entry}"]
        for b in dirty_buckets:                           # emptied bucket
            meta_files.setdefault(str(b), [])

        if callable(stats):
            stats = stats()
        stats = dict(stats or {})
        schema = stats.pop("__schema", snap["schema"])
        meta_schema = stats.pop("__meta_schema", snap.get("meta_schema"))
        stats["merge_files"] = written
        self._commit({
            "version": snap["version"] + 1,
            "files": new_files,
            "meta_files": meta_files,
            "committed_epochs": sorted(set(snap["committed_epochs"]) | {epoch}),
            "schema": schema,
            "meta_schema": meta_schema,
            "stats": {**snap.get("stats", {}), str(epoch): stats},
            "ts": time.time(),
        })
        return written

    def merge_delta(self, wide_rows: DataFrame, meta_rows: DataFrame,
                    dirty_buckets: list[int], epoch: int,
                    stats: dict | None = None) -> list[str]:
        """Convenience: write + commit in one call (two-job MoR MERGE)."""
        written = self.write_delta(wide_rows, dirty_buckets, epoch)
        return self.commit_delta(written, meta_rows, dirty_buckets, epoch,
                                 stats)

    # ------------------------------------------------------------------ read

    def read(self, spark: SparkSession, buckets: list[int] | None = None
             ) -> DataFrame | None:
        """Reconstruct current rows: wide deltas ⋈ meta content pointers,
        plus tombstone rows rebuilt from meta (output schema == COW read)."""
        return self._read_snapshot(spark, self.current_snapshot(), buckets)

    def _read_snapshot(self, spark: SparkSession, snap: dict,
                       buckets: list[int] | None = None) -> DataFrame | None:
        sel = snap["files"]
        msel = snap.get("meta_files", {})
        if buckets is not None:
            sel = {str(b): sel.get(str(b), []) for b in buckets}
            msel = {str(b): msel.get(str(b), []) for b in buckets}
        files = [f for fl in sel.values() for f in fl]
        mfiles = [f for fl in msel.values() for f in fl]
        schema = self._schema_from_json(snap["schema"])
        if not mfiles:
            return spark.createDataFrame([], schema) if schema else None
        meta = (spark.read.option("mergeSchema", "true")
                .parquet(*[os.path.join(self.path, "data", f) for f in mfiles]))
        mschema = self._schema_from_json(snap.get("meta_schema"))
        if mschema is not None:
            empty = spark.createDataFrame([], mschema)
            meta = meta.unionByName(empty, allowMissingColumns=True)
            meta = meta.select(*[F.col(c) for c in empty.columns])
        extras = [c for c in meta.columns if c not in {
            "url", "warc_ts", "lsn", "content_ts", "content_lsn",
            "content_fp", "deleted"}]
        if files:
            wide = (spark.read.option("mergeSchema", "true")
                    .parquet(*[os.path.join(self.path, "data", f)
                               for f in files]))
        else:
            wide = None
        live_meta = meta.filter(~F.col("deleted"))
        parts = []
        if wide is not None:
            # join on equal-named key columns to avoid ambiguous refs
            w = wide.select(
                "url", F.col("warc_ts").alias("content_ts"),
                F.col("lsn").alias("content_lsn"),
                "html", "text", "lang", "chunks")
            cur = (w.join(live_meta.select(
                "url", "content_ts", "content_lsn", "warc_ts", "lsn",
                "content_fp", *extras),
                ["url", "content_ts", "content_lsn"], "inner")
                .select("url", "warc_ts", "lsn", "html", "text", "lang",
                        "content_fp", F.lit(False).alias("deleted"),
                        "chunks", *extras))
            parts.append(cur)
        if schema is not None:
            chunks_type = schema["chunks"].dataType
        else:
            chunks_type = parts[0].schema["chunks"].dataType if parts else None
        tomb = (meta.filter(F.col("deleted"))
                .select("url", "warc_ts", "lsn",
                        F.lit(None).cast("binary").alias("html"),
                        F.lit(None).cast("string").alias("text"),
                        F.lit(None).cast("string").alias("lang"),
                        F.lit(None).cast("binary").alias("content_fp"),
                        F.lit(True).alias("deleted"),
                        (F.lit(None).cast(chunks_type) if chunks_type is not None
                         else F.lit(None)).alias("chunks"),
                        *extras))
        parts.append(tomb)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        if schema is not None:
            empty = spark.createDataFrame([], schema)
            out = out.unionByName(empty, allowMissingColumns=True)
            out = out.select(*[F.col(c) for c in empty.columns])
        return out

    def read_version(self, spark: SparkSession, version: int
                     ) -> DataFrame | None:
        with open(os.path.join(self.path, "snapshots",
                               f"v{version:08d}.json")) as f:
            snap = json.load(f)
        return self._read_snapshot(spark, snap)

    # ----------------------------------------------------------- maintenance

    @staticmethod
    def _fold_live(cur: DataFrame, meta: DataFrame) -> DataFrame:
        """Live wide content rows for a rewrite (compact/rebucket): current
        reconstructed rows keyed back to their CONTENT version keys
        (warc_ts/lsn = the pointer target) so meta pointers stay valid."""
        return (cur.filter(~F.col("deleted"))
                .join(meta.select("url", "content_ts", "content_lsn"),
                      "url", "inner")
                .select("url",
                        F.col("content_ts").alias("warc_ts"),
                        F.col("content_lsn").alias("lsn"),
                        "html", "text", "lang", "content_fp", "chunks"))

    def compact(self, spark: SparkSession, target_files_per_bucket: int = 1
                ) -> int:
        """Fold a bucket's wide deltas into one file of live content rows
        (MoR read-amplification bound). Meta is already one file per bucket.
        Compacted wide rows keep warc_ts/lsn = the CONTENT version keys so
        meta pointers stay valid."""
        snap = self.current_snapshot()
        over = [int(b) for b, fl in snap["files"].items()
                if len(fl) > target_files_per_bucket]
        if not over:
            return 0
        cur = self._read_snapshot(spark, snap, buckets=over)
        meta = self.read_meta(spark, buckets=over)
        live = self._fold_live(cur, meta)
        token = f"compact-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.path, "data", f"delta-{token}")
        (live.withColumn("__bucket", self.bucket_expr())
         .repartition(len(over), "__bucket")
         .write.partitionBy("__bucket").mode("overwrite").parquet(out_dir))
        new_files = dict(snap["files"])
        for b in over:
            new_files[str(b)] = []
        for entry in os.listdir(out_dir):
            if entry.startswith("__bucket="):
                b = entry.split("=", 1)[1]
                new_files[b] = [f"delta-{token}/{entry}"]
        self._commit({**snap, "version": snap["version"] + 1,
                      "files": new_files, "ts": time.time()})
        return len(over)

    def rebucket(self, spark: SparkSession, new_n: int) -> int:
        """MoR spec evolution: one rewrite of BOTH file sets under the new
        spec — live wide content (folded like compact, content version keys
        preserved so meta pointers stay valid) and the skinny meta — in a
        single snapshot flip. See BucketedLake.rebucket."""
        if new_n < 1:
            raise ValueError(f"new_n must be >= 1, got {new_n}")
        snap = self.current_snapshot()
        if new_n == self.n_buckets:
            return self.n_buckets
        cur = self._read_snapshot(spark, snap)
        meta = self.read_meta(spark)
        old_n, self.n_buckets = self.n_buckets, new_n
        token = f"rebucket-{uuid.uuid4().hex[:8]}"
        new_files: dict[str, list[str]] = {}
        new_meta: dict[str, list[str]] = {}
        if cur is not None and meta is not None:
            live = self._fold_live(cur, meta)
            wide_dir = os.path.join(self.path, "data", f"delta-{token}")
            (live.withColumn("__bucket", self.bucket_expr())
             .repartition(new_n, "__bucket")
             .write.partitionBy("__bucket").mode("overwrite")
             .parquet(wide_dir))
            for entry in os.listdir(wide_dir):
                if entry.startswith("__bucket="):
                    new_files[entry.split("=", 1)[1]] = [
                        f"delta-{token}/{entry}"]
            meta_dir = os.path.join(self.path, "data", f"meta-{token}")
            (meta.withColumn("__bucket", self.bucket_expr())
             .repartition(new_n, "__bucket")
             .write.partitionBy("__bucket").mode("overwrite")
             .parquet(meta_dir))
            for entry in os.listdir(meta_dir):
                if entry.startswith("__bucket="):
                    new_meta[entry.split("=", 1)[1]] = [
                        f"meta-{token}/{entry}"]
        self._commit({**snap, "version": snap["version"] + 1,
                      "files": new_files, "meta_files": new_meta,
                      "ts": time.time()})
        return old_n


class AppendOnlyTable:
    """Append-only parquet table with atomic per-epoch commits (chunk store,
    metrics). An epoch's files become visible only via the manifest flip, and
    re-appending a committed epoch is a no-op — idempotent under replay."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)
        self._lake = BucketedLake.__new__(BucketedLake)
        self._lake.path = path
        self._lake.key_col = ""
        self._lake.n_buckets = 0

    def current_snapshot(self) -> dict:
        return self._lake.current_snapshot()

    def committed_epochs(self) -> set[int]:
        return self._lake.committed_epochs()

    def append(self, df: DataFrame, epoch: int | list[int],
               props: dict | None = None) -> None:
        """Append df, atomically marking one epoch (or a list of epochs —
        the steady-state flush folds several epochs into one write)
        committed. `props` merge into the table manifest; the `deduped`
        flag records whether every append so far was globally unique
        (observability mode) or duplicates are collapsed at read time
        (steady-state mode) — it only ever degrades True -> False, so any
        consumer can trust a True."""
        epochs = sorted({epoch} if isinstance(epoch, int) else set(epoch))
        snap = self.current_snapshot()
        new = [e for e in epochs if e not in snap["committed_epochs"]]
        if not new:
            return
        token = f"e{new[0]:06d}-{uuid.uuid4().hex[:8]}"
        rel = f"append-{token}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, "data", rel))
        files = dict(snap["files"])
        files.setdefault("0", []).append(rel)
        old_props = dict(snap.get("props", {}))
        if props:
            merged = {**old_props, **props}
            if "deduped" in old_props or "deduped" in (props or {}):
                merged["deduped"] = (old_props.get("deduped", True)
                                     and props.get("deduped", True))
            old_props = merged
        self._lake._commit({
            "version": snap["version"] + 1,
            "files": files,
            "committed_epochs": sorted(set(snap["committed_epochs"])
                                       | set(new)),
            "schema": snap["schema"],
            "stats": snap.get("stats", {}),
            "props": old_props,
            "ts": time.time(),
        })

    def props(self) -> dict:
        """Table manifest properties (e.g. the `deduped` store-mode flag)."""
        return dict(self.current_snapshot().get("props", {}))

    def expire_snapshots(self, keep_last: int = 2) -> int:
        """Drop old manifests and any data directory no kept snapshot
        references — the cleanup that collects append dirs superseded by
        ``ChunkStore.compact()`` (VERDICT r3 #8). Same crash-orphan-safe
        logic as the lake's expire (the manifest format is shared).
        Returns the number of data directories removed."""
        return self._lake.expire_snapshots(keep_last=keep_last)

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self._lake.read(spark)


class ChunkStore(AppendOnlyTable):
    """Chunk-hash store: an AppendOnlyTable plus the read-side dedup view and
    the maintenance op that bounds it.

    Steady-state ingest appends per-flush deltas in which the same hash may
    recur across epochs (deduped=false manifest flag); `current()` collapses
    them (one row per hash, earliest first_seen_epoch, min len) and
    `compact()` MATERIALIZES that view — folding N delta files into one and
    restoring the deduped=true contract — so the read cost stays O(unique
    chunks) no matter how many epochs have appended. Mirrors the lake's own
    MoR compact(): same trade, same maintenance cadence."""

    DEDUP_SCHEMA = "chunk_hash binary, len long, first_seen_epoch long"

    def current(self, spark: SparkSession) -> DataFrame | None:
        """Deduplicated view: one row per hash, earliest sighting wins."""
        raw = self.read(spark)
        if raw is None:
            return None
        return (raw.groupBy("chunk_hash")
                .agg(F.min("len").alias("len"),
                     F.min("first_seen_epoch").alias("first_seen_epoch")))

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Fold delta files into one deduplicated file (new manifest
        version; committed epochs and props carry over, with deduped
        restored to true). Returns the number of files folded, 0 if the
        store is already within target. Superseded data directories stay on
        disk until ``expire_snapshots()`` collects them (same orphan policy
        as the lake: compaction flips the manifest, expiry reclaims)."""
        snap = self.current_snapshot()
        files = snap["files"].get("0", [])
        if len(files) <= target_files:
            return 0
        cur = self.current(spark)
        rel = f"append-compact-{uuid.uuid4().hex[:8]}"
        cur.write.mode("overwrite").parquet(
            os.path.join(self.path, "data", rel))
        props = dict(snap.get("props", {}))
        props["deduped"] = True
        self._lake._commit({**snap, "version": snap["version"] + 1,
                            "files": {"0": [rel]}, "props": props,
                            "ts": time.time()})
        return len(files)
