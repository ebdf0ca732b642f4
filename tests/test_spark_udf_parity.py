"""Kernel vs Spark pandas-UDF parity: identical boundaries through Arrow plumbing."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from rust_chunking_spark.functions import chunk_udf, fingerprint_udf, sha3_256_udf
from rust_chunking_spark.kernels import vectorized as V


def _corpus():
    rng = np.random.default_rng(11)
    bufs = [
        bytes(rng.integers(0, 256, n, dtype=np.uint8))
        for n in [0, 1, 100, 5000, 20000, 70000]
    ]
    bufs.append(b"\x01" * 50000)
    bufs.append(b"<html>" + b"<p>abc</p>" * 3000 + b"</html>")
    return bufs


def test_chunk_udf_parity(spark):
    bufs = _corpus()
    df = spark.createDataFrame([(i, b) for i, b in enumerate(bufs)],
                               "id long, html binary")
    for algo in ["super", "ae", "ram", "rabin", "seq", "ultra", "leap"]:
        rows = (df.select("id", chunk_udf(algo)(F.col("html")).alias("chunks"))
                .orderBy("id").collect())
        for row in rows:
            expected = [(int(p), int(ln)) for p, ln in V.ALGORITHMS[algo](bufs[row.id])]
            got = [(c.pos, c.len) for c in row.chunks]
            assert got == expected, f"{algo} row {row.id}"


def test_fingerprint_udf_hashes(spark):
    bufs = _corpus()
    df = spark.createDataFrame([(i, b) for i, b in enumerate(bufs)],
                               "id long, html binary")
    rows = (df.select("id", fingerprint_udf("super")(F.col("html")).alias("chunks"))
            .orderBy("id").collect())
    for row in rows:
        b = bufs[row.id]
        for c in row.chunks:
            assert bytes(c.hash) == hashlib.sha3_256(b[c.pos:c.pos + c.len]).digest()
        assert sum(c.len for c in row.chunks) == len(b)


def test_sha3_udf(spark):
    df = spark.createDataFrame([(b"abc",), (None,)], "b binary")
    got = df.select(sha3_256_udf(F.col("b")).alias("h")).collect()
    assert bytes(got[0].h) == hashlib.sha3_256(b"abc").digest()
    assert got[1].h is None


def test_super_records_seed_parity(spark):
    """chunk_udf(records=seed) must equal the local kernel given the same
    seed map per row (Chunker::with_records semantics: fresh copy per file)."""
    import numpy as np

    from rust_chunking_spark.functions.chunking import (chunk_udf,
                                                        extract_super_records)
    from rust_chunking_spark.kernels import vectorized as V

    rng = np.random.default_rng(17)
    seed_docs = [rng.integers(0, 256, 20000, dtype=np.uint8).tobytes()
                 for _ in range(3)]
    # low-entropy targets so record hits actually fire
    targets = [seed_docs[0], seed_docs[1][:15000] + seed_docs[2][:5000],
               rng.integers(0, 4, 30000, dtype=np.uint8).tobytes()]
    params = dict(min_size=2048, avg_size=4096, max_size=32768)
    seed = extract_super_records(seed_docs, **params)
    assert seed  # the seed map is non-trivial

    df = spark.createDataFrame([(i, t) for i, t in enumerate(targets)],
                               "i long, buf binary")
    udf = chunk_udf("super", records=seed, **params)
    rows = {r.i: r.c for r in
            df.select("i", udf(F.col("buf")).alias("c")).collect()}
    for i, t in enumerate(targets):
        local = V.super_chunks(t, records=dict(seed), **params)
        got = [(c.pos, c.len) for c in rows[i]]
        assert got == [(int(p), int(ln)) for p, ln in local]
    # seeded chunking differs from unseeded on at least one target
    # (proves the seed map actually flowed into the UDF)
    diff = any(
        [(c.pos, c.len) for c in rows[i]]
        != [(int(p), int(ln)) for p, ln in V.super_chunks(t, **params)]
        for i, t in enumerate(targets))
    assert diff


def test_multi_chunk_lens_udf_matches_per_algo(spark):
    """The fused all-algorithms UDF (one Arrow pass for the stats query)
    must emit exactly the per-algo chunk_udf lengths, in algorithm-major
    order, with None passthrough."""
    from rust_chunking_spark.functions.chunking import multi_chunk_lens_udf

    bufs = _corpus()
    algos = ["super", "ae", "ram", "rabin", "seq", "ultra", "leap"]
    udf = multi_chunk_lens_udf({a: {} for a in algos})
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(bufs)] + [(len(bufs), None)],
        "id long, html binary")
    rows = {r.id: r.lens for r in
            df.select("id", udf(F.col("html")).alias("lens")).collect()}
    assert rows[len(bufs)] is None
    for i, buf in enumerate(bufs):
        expected = [(a, int(ln)) for a in algos
                    for _, ln in V.ALGORITHMS[a](buf)]
        assert [(c.algo, c.len) for c in rows[i]] == expected, f"row {i}"
