"""Physical-plan inspection helpers.

The 100 TB design rests on plan properties (column pruning into parquet,
broadcast joins instead of wide shuffles, filter pushdown); these helpers turn
them into assertions so regressions fail tests instead of degrading at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema clauses of every parquet scan in the plan."""
    plan = explain_str(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def assert_reads_columns(df: DataFrame, must_not_read: list[str],
                         source_hint: str | None = None) -> None:
    """Assert no parquet scan (optionally filtered by path hint) reads any of
    the named columns — i.e. column pruning reached the files."""
    plan = explain_str(df)
    for block in plan.split("(")[1:]:
        if "Scan parquet" not in plan:
            break
    for schema in scan_read_schemas(df):
        cols = {c.split(":")[0] for c in schema.split(",") if c}
        if source_hint is not None:
            # crude scoping: skip scans whose schema clearly isn't the source
            if not cols & {"url", "html", "text"}:
                continue
        bad = cols & set(must_not_read)
        assert not bad, f"scan reads pruned columns {bad}: struct<{schema}>"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = explain_str(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected >= {min_count} broadcast joins:\n{plan[:2000]}"


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excluding broadcast exchanges)."""
    plan = explain_str(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|"
                          r"\bExchange RoundRobinPartitioning", plan))


def assert_pushed_filters(df: DataFrame) -> None:
    plan = explain_str(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), f"no pushed filters:\n{plan[:2000]}"


def estimate_scan_splits(df: DataFrame) -> int:
    """Estimate a file-backed DataFrame's scan split count WITHOUT `df.rdd`
    (whose plan->RDD conversion costs seconds on the first call in a
    session), mirroring Spark's FilePartitions math: every file is billed
    openCostInBytes on top of its size, the target split size is
    min(maxPartitionBytes, max(openCost, totalCost/defaultParallelism)),
    and splits ~= totalCost / targetSplit. The openCost term is what stops
    many-small-files inputs from looking like one giant packable blob (the
    real planner also refuses to pack them tighter than ~openCost each).

    Used to decide whether a compute-heavy UDF stage needs a round-robin
    spread (splits < cores). Returns 0 for a non-file source (unknown —
    caller decides the fallback); remote-FS files, whose sizes are unknown
    driver-side, fall back to the file count."""
    import math
    import os

    files = df.inputFiles()
    if not files:
        return 0
    sizes = []
    for f in files:
        p = f[7:] if f.startswith("file://") else (
            f[5:] if f.startswith("file:") else None)
        if p is None:                    # remote FS: size unknown driver-side
            return len(files)
        try:
            sizes.append(os.path.getsize(p))
        except OSError:
            return len(files)
    total = sum(sizes)
    spark = df.sparkSession

    def _bytes_conf(key: str, default: int) -> int:
        try:
            v = str(spark.conf.get(key))
        except Exception:
            return default
        v = v.strip().lower()
        for suf, mult in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                          ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                          ("b", 1)):
            if v.endswith(suf):
                try:
                    return int(float(v[:-len(suf)]) * mult)
                except ValueError:
                    return default
        try:
            return int(v)
        except ValueError:
            return default

    max_pb = _bytes_conf("spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf("spark.sql.files.openCostInBytes", 4 << 20)
    par = spark.sparkContext.defaultParallelism
    total_cost = total + len(files) * open_cost
    target = min(max_pb, max(open_cost, total_cost // max(par, 1)))
    # partitions = cost bins, but never more than the raw size-based splits
    # (openCost pads the bin math, yet a file still yields at least one and
    # at most ceil(size/target) splits before packing)
    cost_bins = math.ceil(total_cost / max(target, 1))
    raw_splits = len(files) + sum(
        max(0, math.ceil(sz / max(target, 1)) - 1) for sz in sizes)
    return max(1, min(cost_bins, raw_splits))
