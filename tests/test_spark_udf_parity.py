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
