"""Chunking + fingerprinting as vectorized pandas UDFs (Arrow-batched).

The Spark surface for the reference's seven chunkers (SURVEY.md §2.1): each
UDF maps ``html: binary -> array<struct<pos: long, len: long>>`` (or with a
sha3-256 hash per chunk for the fingerprint variant). Cross-row parallelism is
Spark's axis; the per-row scan is the vectorized numpy kernel, so boundaries
are identical to the Rust reference (golden-tested).

Design notes (100 TB scale):
- scalar pandas_udf (Series -> Series): whole-stage codegen feeds the Python
  worker via Arrow; no per-row Python in the plan (input_hint requirement).
- LUT constants (~12 KB) live in the module, serialized once into the UDF
  closure — the effective broadcast.
- sha3-256 comes from hashlib inside the UDF (Spark's sha2 is SHA-2;
  filetest.rs:100-120 uses SHA3-256).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernels import vectorized as V
from ..kernels.scalar import DEFAULT_SIZES

CHUNK_SCHEMA = ArrayType(StructType([
    StructField("pos", LongType(), False),
    StructField("len", LongType(), False),
]))

FP_CHUNK_SCHEMA = ArrayType(StructType([
    StructField("pos", LongType(), False),
    StructField("len", LongType(), False),
    StructField("hash", BinaryType(), False),
]))


def make_chunker(algo: str, records=None, **params):
    """Plain-Python chunker callable bytes -> np.ndarray[(n,2)] for `algo`.

    `records` (super only) is a SuperCDC seed record map — gear hash ->
    next-chunk length (supercdc.rs:49-59) — shared across rows for cross-file
    reuse. Accepts a plain dict (serialized once into the UDF closure) or a
    ``sc.broadcast`` handle for large maps. Each row chunkers a FRESH COPY,
    mirroring ``Chunker::with_records`` per file: rows must not see each
    other's in-flight record updates (task order is nondeterministic).
    """
    fn = V.ALGORITHMS[algo]
    if records is not None:
        if algo != "super":
            raise ValueError("record maps are a SuperCDC feature")
        def chunk_with_seed(buf):
            seed = records.value if hasattr(records, "value") else records
            return fn(buf, records=dict(seed), **params)
        return chunk_with_seed
    if not params:
        return fn
    return lambda buf: fn(buf, **params)


def chunk_udf(algo: str, **params):
    """pandas UDF: binary -> array<struct<pos,len>> with exact reference boundaries."""
    chunker = make_chunker(algo, **params)

    @pandas_udf(CHUNK_SCHEMA)
    def _chunk(col: pd.Series) -> pd.Series:
        out = []
        for buf in col:
            if buf is None:
                out.append(None)
                continue
            arr = chunker(buf)
            out.append([{"pos": int(p), "len": int(ln)} for p, ln in arr])
        return pd.Series(out)

    return _chunk


def multi_chunk_lens_udf(params_by_algo: dict):
    """pandas UDF: binary -> array<struct<algo: string, len: long>> — chunk
    lengths for EVERY algorithm in one Arrow round-trip. Exists for the
    all-algorithms stats query (print_info parity over the corpus,
    filetest.rs:69-88): per-algo :func:`chunk_udf` branches cost one scan +
    one Python-worker feed EACH; at seven algorithms the fixed Arrow/UDF
    setup dominates the (small) kernel time, so one fused pass over one
    scan is ~3x cheaper end-to-end. Boundaries are the same vectorized
    kernels, so the emitted lengths are identical to the per-algo UDFs.

    ``params_by_algo``: {algo: param dict} — the algorithm set and params
    are frozen into the UDF closure (LUTs ride along once, as usual)."""
    chunkers = {algo: make_chunker(algo, **params)
                for algo, params in params_by_algo.items()}
    schema = ArrayType(StructType([
        StructField("algo", StringType(), False),
        StructField("len", LongType(), False),
    ]))

    @pandas_udf(schema)
    def _multi(col: pd.Series) -> pd.Series:
        out = []
        for buf in col:
            if buf is None:
                out.append(None)
                continue
            b = bytes(buf)
            out.append([{"algo": algo, "len": int(ln)}
                        for algo, chunker in chunkers.items()
                        for _, ln in chunker(b)])
        return pd.Series(out)

    return _multi


def fingerprint_udf(algo: str = "super", **params):
    """pandas UDF: binary -> array<struct<pos,len,hash>>; hash = SHA3-256 of chunk bytes.

    Mirrors the reference dedup pass (filetest.rs:100-120) as a reusable
    column expression; the page-level content fingerprint used for no-op
    detection is derived downstream (sha3 over the concatenated chunk hashes).
    """
    chunker = make_chunker(algo, **params)

    @pandas_udf(FP_CHUNK_SCHEMA)
    def _fp(col: pd.Series) -> pd.Series:
        out = []
        for buf in col:
            if buf is None:
                out.append(None)
                continue
            b = bytes(buf)
            arr = chunker(b)
            out.append([
                {"pos": int(p), "len": int(ln),
                 "hash": hashlib.sha3_256(b[p:p + ln]).digest()}
                for p, ln in arr
            ])
        return pd.Series(out)

    return _fp


CONTENT_SCHEMA = StructType([
    StructField("fp", BinaryType(), False),
    StructField("chunks", FP_CHUNK_SCHEMA, False),
])


def content_udf(algo: str = "super", **params):
    """pandas UDF: binary -> struct(fp: sha3-256(html), chunks: fingerprinted
    chunk array) — page fingerprint and chunking fused into ONE pass so the
    ingest engine decodes the wide event column once per epoch instead of
    twice (separate sha3 then chunk passes each re-scan the source parquet)."""
    chunker = make_chunker(algo, **params)

    @pandas_udf(CONTENT_SCHEMA)
    def _content(col: pd.Series) -> pd.DataFrame:
        fps, chks = [], []
        for buf in col:
            if buf is None:
                fps.append(None)
                chks.append(None)
                continue
            b = bytes(buf)
            fps.append(hashlib.sha3_256(b).digest())
            arr = chunker(b)
            chks.append([
                {"pos": int(p), "len": int(ln),
                 "hash": hashlib.sha3_256(b[p:p + ln]).digest()}
                for p, ln in arr
            ])
        return pd.DataFrame({"fp": fps, "chunks": chks})

    return _content


CONTENT_SKIP_SCHEMA = StructType([
    StructField("fp", BinaryType(), True),
    StructField("chunks", FP_CHUNK_SCHEMA, True),
])


def content_skip_udf(algo: str = "super", records=None, **params):
    """Two-column variant of :func:`content_udf`: ``(html, cur_fp) ->
    struct(fp, chunks)`` where ``chunks`` is computed ONLY when the page
    fingerprint differs from ``cur_fp`` (the caller's current state for
    the key). The MoR content pass feeds each candidate's current
    fingerprint in and drops unchanged rows before the bucket shuffle —
    a no-op recrawl (a third of a CC-style recrawl epoch) then costs one
    sha3 instead of sha3 + chunking + per-chunk hashing + a wide
    shuffled+written delta row. Rows whose fp matches get chunks=null
    (they are filtered out before the write; the null never lands).
    MUST be used ``.asNondeterministic()`` when its output feeds a
    filter, or the filter pushdown re-evaluates the UDF (guide §4.4) —
    the engine call site does this.
    """
    chunker = make_chunker(algo, records=records, **params)

    @pandas_udf(CONTENT_SKIP_SCHEMA)
    def _content(col: pd.Series, cur: pd.Series) -> pd.DataFrame:
        fps, chks = [], []
        for buf, cfp in zip(col, cur):
            if buf is None:
                fps.append(None)
                chks.append(None)
                continue
            b = bytes(buf)
            fp = hashlib.sha3_256(b).digest()
            fps.append(fp)
            if cfp is not None and bytes(cfp) == fp:
                chks.append(None)      # unchanged: dropped pre-shuffle
                continue
            arr = chunker(b)
            chks.append([
                {"pos": int(p), "len": int(ln),
                 "hash": hashlib.sha3_256(b[p:p + ln]).digest()}
                for p, ln in arr
            ])
        return pd.DataFrame({"fp": fps, "chunks": chks})

    return _content


@pandas_udf(BinaryType())
def sha3_256_udf(col: pd.Series) -> pd.Series:
    """SHA3-256 of a binary column (Spark sha2 is SHA-2; reference uses SHA3)."""
    return col.map(
        lambda b: None if b is None else hashlib.sha3_256(bytes(b)).digest())


def with_chunks(df, algo: str = "super", src_col: str = "html",
                out_col: str = "chunks", fingerprints: bool = True, **params):
    """Attach chunk (and hash) arrays to a DataFrame; built-ins stay JVM-side."""
    udf = fingerprint_udf(algo, **params) if fingerprints else chunk_udf(algo, **params)
    return df.withColumn(out_col, udf(F.col(src_col)))


def default_sizes(algo: str) -> tuple[int, int, int]:
    return DEFAULT_SIZES[algo]


def extract_super_records(bufs, seed: dict | None = None, **params) -> dict:
    """Run buffers SEQUENTIALLY through SuperCDC, accumulating one record map
    (gear hash -> next-chunk length) — the reference's cross-file reuse
    pattern (`with_records`/`give_records`, supercdc.rs:49-59, 156-158).

    Record accumulation is order-dependent (a single-stream semantic), so it
    does not distribute; the intended use at scale is: extract on a sample /
    previous epoch's hot set locally, then pass the map as the `records=`
    seed of `fingerprint_udf`/`chunk_udf` (broadcast, copied per row).
    """
    recs = dict(seed or {})
    for buf in bufs:
        V.super_chunks(bytes(buf), records=recs, **params)
    return recs
