"""Lake maintenance: time travel, compaction, snapshot expiry."""

from pyspark.sql import functions as F

from rust_chunking_spark.datagen import generate_wal
from rust_chunking_spark.engine import BucketedLake, CdcIngestJob
from rust_chunking_spark.engine.lake import AppendOnlyTable


def _replayed(spark, tmp_path, epochs=3):
    wal = generate_wal(n_pages=0, n_epochs=epochs, events_per_epoch=40, seed=13)
    for ep, events in enumerate(wal):
        spark.createDataFrame([dict(e) for e in events]).write.mode(
            "overwrite").parquet(f"{tmp_path}/wal/epoch={ep:06d}")
    lake = BucketedLake(str(tmp_path / "lake"), n_buckets=4)
    job = CdcIngestJob(spark, lake, AppendOnlyTable(str(tmp_path / "chunks")),
                       AppendOnlyTable(str(tmp_path / "metrics")))
    job.run(f"{tmp_path}/wal", list(range(epochs)))
    return lake


def test_time_travel(spark, tmp_path):
    lake = _replayed(spark, tmp_path)
    versions = lake.snapshot_versions()
    assert len(versions) >= 3
    # current vs first-epoch snapshot differ; both readable
    now = lake.read(spark).filter(~F.col("deleted")).count()
    v_first = lake.read_version(spark, versions[0]).filter(
        ~F.col("deleted")).count()
    assert v_first > 0 and now != v_first


def test_compact_and_expire(spark, tmp_path):
    lake = _replayed(spark, tmp_path)
    before = lake.read(spark).orderBy("url").collect()
    n = lake.compact(spark)
    assert n >= 0
    after = lake.read(spark).orderBy("url").collect()
    assert [r.url for r in after] == [r.url for r in before]
    assert [r.lsn for r in after] == [r.lsn for r in before]
    # every bucket now has at most one file
    snap = lake.current_snapshot()
    assert all(len(fl) <= 1 for fl in snap["files"].values())

    removed = lake.expire_snapshots(keep_last=1)
    assert removed >= 1
    again = lake.read(spark).orderBy("url").collect()
    assert [r.url for r in again] == [r.url for r in before]


def test_expire_keeps_current_after_crash_orphan(spark, tmp_path):
    """Crash between writing vN.json and the CURRENT flip leaves an orphan
    manifest NEWER than CURRENT. expire_snapshots must keep the snapshot
    CURRENT names (regression: keeping the newest by version number deleted
    the live manifest + its data, bricking the table)."""
    import json
    import os

    lake = _replayed(spark, tmp_path)
    before = lake.read(spark).orderBy("url").collect()
    cur_v = lake._current_version()

    # simulate the torn commit: orphan manifest newer than CURRENT, pointing
    # at a data directory that was never fully written
    orphan_v = cur_v + 1
    snap = lake.current_snapshot()
    orphan = {**snap, "version": orphan_v,
              "files": {"0": ["merge-orphan/never-written"]}}
    with open(os.path.join(lake.path, "snapshots",
                           f"v{orphan_v:08d}.json"), "w") as f:
        json.dump(orphan, f)

    lake.expire_snapshots(keep_last=1)
    # CURRENT's manifest survived and the table is intact
    assert lake._current_version() == cur_v
    after = lake.read(spark).orderBy("url").collect()
    assert [r.url for r in after] == [r.url for r in before]
    # the orphan manifest was cleaned up, not promoted
    assert orphan_v not in lake.snapshot_versions()
