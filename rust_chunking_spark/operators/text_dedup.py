"""Near-duplicate detection operators for web-text corpora.

These extend the reference's exact chunk-level dedup (filetest.rs:100-120) to
the fuzzy-dedup operators a training-data pipeline needs at 100 TB:

- MinHash + LSH banding: shingle -> minhash signature (vectorized numpy in a
  pandas UDF) -> band hashes -> explode + groupBy band bucket -> candidate
  pairs -> signature-agreement verification. The only O(n^2) step is within
  LSH buckets, which are tiny for any sane banding — the global plan is
  shuffle-by-band-hash, i.e. linear.
- SimHash(64): token-hash sign aggregation; hamming-ball lookups via
  band-exploded prefixes (same LSH trick over 4 x 16-bit bands).

Determinism: all hashing is xxhash-free numpy (splitmix-style) so results are
stable across Python/JVM versions and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & U64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & U64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & U64
    return x ^ (x >> np.uint64(31))


_WS_BYTES = np.zeros(256, dtype=bool)
_WS_BYTES[[9, 10, 11, 12, 13, 32]] = True   # ASCII whitespace
_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _token_hashes(text: str) -> np.ndarray:
    """FNV-1a per token, vectorized ACROSS tokens (one numpy op per byte
    *position*, not per byte): tokens sorted by length descending so the
    alive set at each position is a contiguous prefix — total work is
    O(total bytes) with no per-token Python loop.

    Tokens are ASCII-whitespace-delimited runs of the UTF-8 encoding
    (equivalent to str.split() for ASCII text; rare multibyte whitespace
    stays inside tokens — a documented simplification that only perturbs
    which shingles near-dup estimates are built from, identically on both
    sides of any comparison).
    """
    arr = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n_bytes = len(arr)
    if n_bytes == 0:
        return np.zeros(1, dtype=np.uint64)
    ws = _WS_BYTES[arr]
    nonws = ~ws
    starts = np.flatnonzero(nonws & np.concatenate(([True], ws[:-1])))
    if len(starts) == 0:
        return np.zeros(1, dtype=np.uint64)
    ends = np.flatnonzero(nonws & np.concatenate((ws[1:], [True]))) + 1
    lens = ends - starts
    order = np.argsort(-lens, kind="stable")
    ss = starts[order]
    ll = lens[order]                      # descending
    n = len(ss)
    h = np.full(n, _FNV_OFF, dtype=np.uint64)
    asc = ll[::-1]                        # ascending view for searchsorted
    k = n
    for j in range(int(ll[0])):
        # tokens still alive at byte position j form the prefix [0, k)
        k = n - int(np.searchsorted(asc, j, side="right"))
        hk = h[:k]
        hk ^= arr[ss[:k] + j]
        hk *= _FNV_PRIME
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    th = _token_hashes(text)
    if len(th) < k:
        return _splitmix64(th)
    # rolling k-gram hash: mix of shifted token hashes
    acc = th[:len(th) - k + 1].copy()
    for j in range(1, k):
        acc = (acc * np.uint64(1099511628211)
               + th[j:len(th) - k + 1 + j]) & U64
    return _splitmix64(acc)


def minhash_signature_udf(n_hashes: int = 64, shingle_k: int = 5):
    """pandas UDF: text -> array<long> minhash signature (length n_hashes)."""
    seeds = _splitmix64(np.arange(1, n_hashes + 1, dtype=np.uint64))

    @pandas_udf(ArrayType(LongType()))
    def _sig(col: pd.Series) -> pd.Series:
        out = []
        for text in col:
            if text is None:
                out.append(None)
                continue
            sh = _shingle_hashes(text, shingle_k)
            # n_hashes permutations via xor-mix; min per permutation
            m = _splitmix64(sh[None, :] ^ seeds[:, None]).min(axis=1)
            out.append(m.astype(np.int64).tolist())
        return pd.Series(out)

    return _sig


def simhash64_udf():
    """pandas UDF: text -> bigint simhash (sign of per-bit weighted sums)."""

    @pandas_udf(LongType())
    def _sim(col: pd.Series) -> pd.Series:
        out = []
        for text in col:
            if text is None:
                out.append(None)
                continue
            th = _token_hashes(text)
            # per-bit vote counts via unpackbits on the little-endian byte
            # view: column j == bit j of the hash (no 64xN boolean temp)
            votes = np.unpackbits(th.view(np.uint8).reshape(len(th), 8),
                                  axis=1, bitorder="little").sum(axis=0)
            sig = ((votes * 2) > len(th)).astype(np.uint64)
            out.append(int((sig << np.arange(64, dtype=np.uint64)).sum()
                           .astype(np.int64)))
        return pd.Series(out)

    return _sim


def lsh_duplicate_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n_hashes: int = 64,
                        bands: int = 16, shingle_k: int = 5,
                        threshold: float = 0.7) -> DataFrame:
    """Near-duplicate pairs (a < b) whose estimated jaccard >= threshold.

    Plan shape (scales linearly): signature UDF -> explode to (band, hash)
    -> shuffle by band bucket -> within-bucket self-join (buckets are tiny)
    -> distinct pairs -> verify by signature agreement.
    """
    rows = n_hashes // bands
    sig_udf = minhash_signature_udf(n_hashes, shingle_k)
    # round-robin repartition before the signature UDF — but ONLY when the
    # input arrives in fewer splits than cores (a small parquet file would
    # serialize the dominant signature compute onto a couple of tasks). At
    # scale the input already has hundreds of splits and the text shuffle
    # would be pure waste.
    from ..plans.inspect import estimate_scan_splits

    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    p = spark.sparkContext.defaultParallelism
    splits = estimate_scan_splits(src)
    if splits == 0:
        # non-file source: split count unknown from file stats — fall back
        # to the (slower, plan->RDD) partition count rather than silently
        # skipping the spread and serializing the signature UDF
        splits = src.rdd.getNumPartitions()
    if splits < p:
        src = src.repartition(p)
    sigs = src.select("id", sig_udf(F.col("__t")).alias("sig"))
    sigs = sigs.cache()

    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(F.concat_ws(
                     ",", *[F.col("sig")[b * rows + r].cast("string")
                            for r in range(rows)])).alias("bh"))
        for b in range(bands)
    ]
    banded = (sigs.select("id", F.explode(F.array(*band_cols)).alias("b"))
              .select("id", "b.band", "b.bh"))
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (left.join(right,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.bh") == F.col("r.bh"))
                      & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
            .distinct())

    sa = sigs.select(F.col("id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("b"), F.col("sig").alias("sig_b"))
    verified = (cand.join(sa, "a").join(sb, "b")
                .withColumn(
                    "est_jaccard",
                    F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y),"
                           " v -> v))") / F.lit(n_hashes))
                .filter(F.col("est_jaccard") >= threshold)
                .select("a", "b", "est_jaccard"))
    return verified
