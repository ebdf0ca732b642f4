"""Deterministic corpus sampling operators for training-data curation.

No reference counterpart (rust-chunking is a chunking library); these are
the LLM-data-pipeline operators a 100 TB curation run needs: sampling a
corpus down to a token budget while controlling the per-language (or
per-source / per-domain) mix.

Two strategies with different scale shapes:

- ``hash_sample``: keep rows whose salted md5 falls under a threshold.
  Pure row-local predicate — NO shuffle, no state, pushdown-friendly; at
  100 TB this is a filter fused into the scan, and the same row set is
  selected no matter how the corpus is partitioned or re-partitioned
  (sampling by VALUE, not by position — re-runs and resumes agree).
  Per-stratum rates are proportional only in expectation.

- ``stratified_sample``: EXACT per-stratum rate — rank rows inside each
  stratum by the same salted hash and keep the first ceil(frac * n).
  Costs one shuffle on the stratum key plus two window passes. A hot
  stratum (one language dominating a web corpus) concentrates on one
  partition: at real scale either pre-filter with ``hash_sample`` at a
  few x the target rate (bounds the shuffle to ~frac of the corpus) or
  fall back to hash_sample entirely. The rank is by value, so the
  selection is stable under repartitioning, resume, and speculative
  re-execution.

Both hashes are hex-string comparisons / orderings on md5 output, chosen
because Spark and any ANSI engine (the DuckDB oracle included) produce
byte-identical lowercase hex for identical inputs — the selections are
re-derivable in plain SQL with no UDF on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sample_hash(key_col: str, seed: str = "s42") -> F.Column:
    """The shared salted hash: lowercase-hex md5 of ``seed + ':' + key``.

    Lexicographic order on the hex string equals numeric order on the
    128-bit value, so thresholding/ranking the string needs no numeric
    conversion anywhere.
    """
    return F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string")))


def hash_threshold(fraction: float) -> str:
    """8-hex-digit threshold such that P(md5 prefix < threshold) == the
    largest multiple of 2^-32 not above ``fraction`` (exact for dyadic
    fractions like 0.25). fraction == 1.0 returns "g", which is
    lexicographically above every hex digit, so the predicate keeps ALL
    rows — format(2^32, "08x") would be the 9-char "100000000", and an
    8-char hex prefix compares below that only when it starts with "0"
    (a silent ~94% drop for callers sampling "everything")."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    if fraction == 1.0:
        return "g"
    return format(int(fraction * (1 << 32)), "08x")


def hash_sample(df: DataFrame, fraction: float, key_col: str,
                seed: str = "s42") -> DataFrame:
    """Value-deterministic Bernoulli(fraction) sample: keep rows whose
    salted-md5 prefix falls under :func:`hash_threshold`. Shuffle-free.
    """
    h = F.substring(sample_hash(key_col, seed), 1, 8)
    return df.filter(h < F.lit(hash_threshold(fraction)))


def stratified_sample(df: DataFrame, strata_col: str, fraction: float,
                      key_col: str, seed: str = "s42",
                      rank_col: str = "rank_in_stratum") -> DataFrame:
    """Exact-rate stratified sample: per stratum, keep the
    ceil(fraction * n_stratum) rows with the smallest salted hash
    (ties broken by ``key_col``, so the order is total and the selection
    unique). Adds ``rank_col`` (1-based rank inside the stratum).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    h = sample_hash(key_col, seed)
    w_rank = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    w_all = Window.partitionBy(strata_col)
    out = (df.withColumn(rank_col, F.row_number().over(w_rank))
           .withColumn("__n", F.count("*").over(w_all))
           .filter(F.col(rank_col) <= F.ceil(F.col("__n") * F.lit(fraction)))
           .drop("__n"))
    return out


def stratified_sample_sql(table: str, strata_col: str, fraction: float,
                          key_col: str, seed: str = "s42",
                          rank_col: str = "rank_in_stratum",
                          select: str = "*") -> str:
    """The ANSI-SQL twin of :func:`stratified_sample` (DuckDB oracle)."""
    h = f"md5('{seed}:' || CAST({key_col} AS VARCHAR))"
    return (
        f"SELECT {select}, CAST(rn AS BIGINT) AS {rank_col} FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY {strata_col}"
        f"    ORDER BY {h}, {key_col}) AS rn,"
        f"  count(*) OVER (PARTITION BY {strata_col}) AS n_stratum"
        f"  FROM {table})"
        f" WHERE rn <= CEIL(n_stratum * {fraction!r})")


def hash_sample_sql(table: str, fraction: float, key_col: str,
                    seed: str = "s42", select: str = "*") -> str:
    """The ANSI-SQL twin of :func:`hash_sample` (DuckDB oracle)."""
    h = f"substr(md5('{seed}:' || CAST({key_col} AS VARCHAR)), 1, 8)"
    return (f"SELECT {select} FROM {table}"
            f" WHERE {h} < '{hash_threshold(fraction)}'")
