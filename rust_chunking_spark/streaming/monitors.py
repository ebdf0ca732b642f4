"""Streaming monitors over the change-event stream: watermarked windowed
aggregation and a custom stateful per-key operator.

These complement the exactly-once ingest path (stream_ingest.py, which
deliberately runs WITHOUT a watermark — LWW by (warc_ts, lsn) makes late
arrivals safe, see its module docstring). Monitoring aggregations are the
opposite trade: they tolerate dropping very-late events in exchange for
bounded state, which is exactly what an event-time watermark expresses.

Both operators are streaming-native but `windowed_event_counts` also runs
unchanged on a batch DataFrame (same plan minus the watermark node), which is
what the fully-oracled `tumbling_event_counts` driver query exercises.

Scale notes (100 TB / 10^10 events): the windowed agg shuffles only
(window, key, partial-agg) tuples — map-side partial aggregation keeps the
shuffle skinny and the watermark bounds the state store to
O(windows-in-flight x keys). The stateful tracker keys state by url: state
size is O(live urls), each entry three fixed-width values; the Arrow batch
path never loops per row (fingerprint transitions are computed with a
vectorized shift-compare).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_event_counts", "url_change_tracker"]


def windowed_event_counts(events: DataFrame, window: str = "10 minutes",
                          watermark: str = "30 minutes",
                          time_col: str = "ts",
                          key_col: str = "event_type",
                          value_col: str = "value") -> DataFrame:
    """Tumbling-window counts + exact sums per key over event time.

    Streaming input: an event-time watermark (`watermark` behind the max
    observed `time_col`) bounds the aggregation state and defines when a
    window is final — in append output mode a window emits exactly once,
    after the watermark passes its end, and events arriving later than the
    watermark are dropped (tested in tests/test_streaming_monitors.py).

    Batch input: identical plan minus the watermark node, so the result is
    DuckDB-oracle-checkable (`time_bucket` is the same epoch-aligned tumbling
    assignment as Spark's `window()`).

    The sum goes through decimal(18,2) so it is order-independent
    (float addition is not associative; a streaming partial-agg tree must not
    change the answer).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    return (df.groupBy(F.window(F.col(time_col), window).alias("w"),
                       F.col(key_col))
            .agg(F.count("*").alias("n"),
                 F.sum(F.col(value_col).cast("decimal(18,2)"))
                 .cast("double").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    key_col, "n", "sum_value"))


_TRACKER_STATE = "n_events bigint, n_changes bigint, last_fp bigint"


def url_change_tracker(events: DataFrame, key_col: str = "url",
                       fp_col: str = "fp", time_col: str = "warc_ts",
                       order_col: str = "lsn") -> DataFrame:
    """Per-url cumulative change tracking across micro-batches
    (`applyInPandasWithState`): counts events seen and TRUE content changes
    — fingerprint transitions in (time, lsn) order — with the running state
    surviving micro-batch boundaries in the state store.

    This is the custom stateful operator the built-in windowed aggs cannot
    express: "did the content actually change since the last event for this
    key" needs ordered per-key memory of the previous fingerprint. The CDC
    engine computes the same distinction per epoch (engine/ingest.py no-op
    detection); this operator maintains it continuously over an unbounded
    stream, e.g. to drive per-url churn dashboards from the WAL tail.

    Emits the updated (n_events, n_changes, last_fp) row for each url seen
    in the micro-batch (update semantics — the latest row per url is the
    current total). Vectorized: transitions are a shift-compare over the
    batch's fingerprint array, no per-row Python.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (f"{key_col} string, n_events bigint, n_changes bigint,"
                  " last_fp bigint")

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_ev, n_ch, last = state.get
        else:
            n_ev, n_ch, last = 0, 0, None
        # a group larger than the Arrow batch size arrives as SEVERAL pdfs
        # in source order, not (time, lsn) order — concatenate before the
        # single sort, or cross-chunk transitions would be mis-ordered
        parts = [pdf for pdf in pdfs if len(pdf)]
        if parts:
            pdf = (pd.concat(parts, ignore_index=True)
                   if len(parts) > 1 else parts[0])
            pdf = pdf.sort_values([time_col, order_col])
            fps = pdf[fp_col].to_numpy(dtype=np.int64)
            prev = np.empty_like(fps)
            prev[1:] = fps[:-1]
            if last is None:
                # first-ever event: always a change
                prev[0] = fps[0]
                n_ch += 1 + int((fps[1:] != prev[1:]).sum())
            else:
                prev[0] = last
                n_ch += int((fps != prev).sum())
            n_ev += len(fps)
            last = int(fps[-1])
        state.update((n_ev, n_ch, last))
        yield pd.DataFrame({
            key_col: [key[0]], "n_events": [n_ev], "n_changes": [n_ch],
            "last_fp": [last]})

    return (events.groupBy(key_col)
            .applyInPandasWithState(update, out_schema, _TRACKER_STATE,
                                    "update", GroupStateTimeout.NoTimeout))
