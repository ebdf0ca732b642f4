"""SparkSession factory tuned for the CDC-ingest workload.

Scale design notes (targets a 1000-executor cluster; local[N] here):
- AQE on: runtime coalescing + skew-join splitting backstops the explicit
  salting the ingest path does for hot domains.
- Arrow batches capped by *records*, and pages are size-binned upstream, so a
  single Arrow batch of huge html blobs cannot OOM a Python worker.
- Shuffle partitions default to 2x cores locally; on a real cluster this is
  set per-job (or left to AQE with a high initial partition count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "rust-chunking-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * cpus)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # one numpy/BLAS thread per python worker: N workers each spinning an
        # N-thread BLAS pool oversubscribes the box quadratically
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    # Opt-in Spark event log (profiling only — default off): stage-level
    # task metrics are the guide-§1 measurement loop's raw material and
    # the UI is disabled in this sandbox, so the event log is the one way
    # to see where a replay's wall-clock actually goes.
    elog = os.environ.get("SPARK_GRAFT_EVENT_LOG_DIR")
    if elog:
        os.makedirs(elog, exist_ok=True)
        b = (b.config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", elog))
    # Opt-in parquet codec override (A/B'd in BENCH.md round 6): the write
    # phase dominates the replay hot path, and the codec sets its
    # CPU-vs-bytes trade. Default (unset) keeps Spark's snappy.
    codec = os.environ.get("SPARK_GRAFT_PARQUET_CODEC")
    if codec:
        b = b.config("spark.sql.parquet.compression.codec", codec)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
