"""Streaming monitors: watermarked windowed aggs + stateful change tracker.

Micro-batch boundaries are forced with maxFilesPerTrigger=1 and distinct
file mtimes (FileStreamSource orders by modification time), so watermark
advancement and state handoff across batches are genuinely exercised.
"""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from rust_chunking_spark.streaming import (
    url_change_tracker,
    windowed_event_counts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _min(m):
    return T0 + dt.timedelta(minutes=m)


def _write_ordered_files(spark, tmp_path, batches, schema):
    """One flat parquet file per micro-batch, mtimes strictly increasing
    (FileStreamSource processes oldest-mtime first)."""
    import glob
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema)
        stage = f"{src}-stage{i}"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{src}/batch-{i:04d}.parquet"
        shutil.move(part, dst)
        shutil.rmtree(stage)
        t = time.time() + i * 10
        os.utime(dst, (t, t))
    return src, spark.read.parquet(src).schema


def _run_stream(spark, src, schema, make_query, out_name, out_mode):
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (make_query(stream).writeStream.format("memory")
         .queryName(out_name).outputMode(out_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {out_name}")


EVENT_SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def test_windowed_counts_append_drops_late_events(spark, tmp_path):
    """Append mode + watermark: a window emits exactly once, when the
    watermark passes its end and its state is evicted; an event arriving
    AFTER that eviction (here: ts 00:07 for window [00:00,00:10), arriving
    with the watermark already at 00:45) is dropped — it neither changes the
    emitted count nor resurrects the window for a second emission.

    (An event that is late but lands in the same micro-batch that evicts its
    window still merges — Spark applies the late filter against the previous
    batch's watermark — so the eviction is forced one batch earlier here.)"""
    batches = [
        # batch 0: on-time event in window 0 + one ahead (watermark driver)
        [(1, _min(5), "click", 1.0), (2, _min(30), "click", 1.0)],
        # batch 1: watermark -> 00:25, window 0 emitted + evicted (n=1)
        [(3, _min(50), "click", 1.0)],
        # batch 2: late event for window 0, watermark already 00:45 -> dropped
        [(4, _min(7), "click", 1.0)],
        # batch 3: advance watermark past every open window
        [(5, _min(90), "click", 1.0)],
    ]
    src, schema = _write_ordered_files(spark, tmp_path, batches, EVENT_SCHEMA)
    out = _run_stream(
        spark, src, schema,
        lambda s: windowed_event_counts(s, window="10 minutes",
                                        watermark="5 minutes"),
        "late_drop_t", "append")
    rows = {r.window_start.replace(tzinfo=None): r.n for r in out.collect()}
    assert rows[_min(0)] == 1          # late event 4 was dropped
    assert rows[_min(30)] == 1
    assert rows[_min(50)] == 1
    # window 0 emitted exactly once — the late arrival did not resurrect it
    assert out.filter(F.col("window_start") == _min(0)).count() == 1


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    """Complete-mode streaming totals equal the batch plan on the same rows
    (the partial-agg tree across micro-batches must not change sums)."""
    batches = [
        [(i, _min(i), "a" if i % 3 else "b", float(i) / 4) for i in range(20)],
        [(i, _min(i), "a" if i % 2 else "c", float(i) / 8)
         for i in range(20, 45)],
    ]
    src, schema = _write_ordered_files(spark, tmp_path, batches, EVENT_SCHEMA)
    out = _run_stream(
        spark, src, schema,
        lambda s: windowed_event_counts(s, window="15 minutes"),
        "stream_batch_t", "complete")
    batch = windowed_event_counts(spark.read.parquet(src),
                                  window="15 minutes")
    got = {(r.window_start.replace(tzinfo=None), r.event_type):
           (r.n, r.sum_value) for r in out.collect()}
    exp = {(r.window_start.replace(tzinfo=None), r.event_type):
           (r.n, r.sum_value) for r in batch.collect()}
    assert got == exp
    assert len(exp) >= 6


WAL_SCHEMA = "url string, warc_ts timestamp, lsn long, text string"


def test_url_change_tracker_state_survives_batches(spark, tmp_path):
    """applyInPandasWithState: per-url totals accumulate across micro-batches
    and count only TRUE content changes (fingerprint transitions), matching a
    plain-Python replay of the same rows."""
    batches = [
        [("u/a", _min(0), 1, "v1"), ("u/b", _min(0), 2, "x1")],
        # a: recrawl no-op then change; b: no-op
        [("u/a", _min(10), 3, "v1"), ("u/a", _min(20), 4, "v2"),
         ("u/b", _min(10), 5, "x1")],
        # a: change back; b: change; c: first seen
        [("u/a", _min(30), 6, "v1"), ("u/b", _min(30), 7, "x2"),
         ("u/c", _min(30), 8, "z1")],
    ]
    src, schema = _write_ordered_files(spark, tmp_path, batches, WAL_SCHEMA)
    out = _run_stream(
        spark, src, schema,
        lambda s: url_change_tracker(
            s.withColumn("fp", F.xxhash64("text"))),
        "tracker_t", "update")
    # update mode: the memory sink appends each batch's emissions; the row
    # with the max n_events per url is the final total
    rows = out.collect()
    final = {}
    for r in rows:
        if r.url not in final or r.n_events > final[r.url][0]:
            final[r.url] = (r.n_events, r.n_changes)
    # plain-Python oracle over the same rows in (warc_ts, lsn) order
    exp = {}
    for rows_b in batches:
        for url, ts, lsn, text in sorted(rows_b, key=lambda x: (x[1], x[2])):
            n_ev, n_ch, last = exp.get(url, (0, 0, None))
            exp[url] = (n_ev + 1, n_ch + (1 if text != last else 0), text)
    assert final == {u: (n, c) for u, (n, c, _last) in exp.items()}
    assert final["u/a"] == (4, 3)      # v1, noop, v2, v1
    assert final["u/b"] == (3, 2)      # x1, noop, x2
    assert final["u/c"] == (1, 1)
    # state genuinely crossed batch boundaries: u/a emitted in 3 batches
    assert len([r for r in rows if r.url == "u/a"]) == 3


def test_windowed_counts_batch_runs_without_watermark(spark):
    """The same operator on a batch DataFrame: no watermark node, plain agg
    (this is the plan the oracled tumbling_event_counts query uses)."""
    df = spark.createDataFrame(
        [(1, _min(1), "a", 2.0), (2, _min(11), "a", 3.0),
         (3, _min(12), "b", 1.0)], EVENT_SCHEMA)
    rows = {(r.window_start.replace(tzinfo=None), r.event_type): r.n
            for r in windowed_event_counts(df, window="10 minutes").collect()}
    assert rows == {(_min(0), "a"): 1, (_min(10), "a"): 1, (_min(10), "b"): 1}

def test_url_change_tracker_multi_chunk_group_ordering(spark, tmp_path):
    """A group larger than the Arrow batch size reaches the state function
    as SEVERAL pdfs whose concatenation — not each chunk individually — must
    be sorted by (time, lsn) before counting transitions (code-review r3
    finding #2). Events are written in reverse time order so per-chunk
    sorting would interleave fingerprints and over-count changes."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        # one url, 8 events, reverse time order in the source; true change
        # sequence in time order: A A A A B B B B -> 2 changes
        rows = [("u/x", _min(80 - 10 * i), 8 - i,
                 "B" if 80 - 10 * i >= 50 else "A")
                for i in range(8)]
        src, schema = _write_ordered_files(spark, tmp_path, [rows], WAL_SCHEMA)
        out = _run_stream(
            spark, src, schema,
            lambda s: url_change_tracker(
                s.withColumn("fp", F.xxhash64("text"))),
            "tracker_chunks_t", "update")
        final = sorted(out.collect(), key=lambda r: r.n_events)[-1]
        assert final.n_events == 8
        assert final.n_changes == 2
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_url_change_tracker_custom_key_col(spark, tmp_path):
    """key_col is honored end-to-end: output column carries the key name."""
    rows = [("example.com", _min(0), 1, "a"), ("example.com", _min(1), 2, "b"),
            ("other.net", _min(0), 3, "c")]
    src, schema = _write_ordered_files(
        spark, tmp_path, [rows],
        "domain string, warc_ts timestamp, lsn long, text string")
    out = _run_stream(
        spark, src, schema,
        lambda s: url_change_tracker(
            s.withColumn("fp", F.xxhash64("text")), key_col="domain"),
        "tracker_key_t", "update")
    got = {r.domain: (r.n_events, r.n_changes) for r in out.collect()}
    assert got == {"example.com": (2, 2), "other.net": (1, 1)}
