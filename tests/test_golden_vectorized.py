"""Vectorized kernels vs Rust-generated golden boundaries — every fixture, full size."""

import json
import pathlib

import pytest

from rust_chunking_spark.kernels import scalar as S
from rust_chunking_spark.kernels import vectorized as V

def _super_with_prefix_records(fn, b, mn, avg, mx):
    """Mirror golden_gen super_records: seed the record map by chunking the
    first half, then chunk the full buffer with the carried records
    (with_records/give_records, supercdc.rs:49-59, 156-158)."""
    recs = {}
    fn(bytes(b)[:len(b) // 2], mn, avg, mx, records=recs)
    return fn(b, mn, avg, mx, records=recs)


CASE_RUNNERS = {
    ("ae", "default"): lambda b: V.ae_chunks(b, 8192, 16384),
    ("ae", "filetest"): lambda b: V.ae_chunks(b, 4096, 16384),
    ("ram", "default"): lambda b: V.ram_chunks(b, 8192, 16384, 32),
    ("ram", "filetest"): lambda b: V.ram_chunks(b, 4096, 16384, 32),
    ("rabin", "default"): lambda b: V.rabin_chunks(b, 16384, 65536),
    ("rabin", "custom"): lambda b: V.rabin_chunks(b, 3000, 100000),
    # rabin_zero (all-zero tables) has an unbounded-memory hash; scalar-only path
    ("rabin_zero", "unittest"): lambda b: S.rabin_chunks(
        b, 3000, 100000, tables=S.RABIN_ZERO_TABLES),
    ("seq", "inc"): lambda b: V.seq_chunks(b, 4096, 16384, increasing=True),
    ("seq", "dec"): lambda b: V.seq_chunks(b, 4096, 16384, increasing=False),
    ("super", "default"): lambda b: V.super_chunks(b, 4096, 8192, 65536),
    ("super", "custom"): lambda b: V.super_chunks(b, 2048, 4096, 32768),
    ("ultra", "default"): lambda b: V.ultra_chunks(b, 2048, 10240, 65536),
    ("ultra", "custom"): lambda b: V.ultra_chunks(b, 1024, 4096, 16384),
    ("leap", "default"): lambda b: V.leap_chunks(b, 8192, 16384),
    ("ultra_batch", "default"): lambda b: V.ultra_generate_chunks(
        b, 2048, 10240, 65536),
    ("ultra_batch", "custom"): lambda b: V.ultra_generate_chunks(
        b, 1024, 4096, 16384),
    ("super_records", "default"): lambda b: _super_with_prefix_records(
        V.super_chunks, b, 4096, 8192, 65536),
    ("super_records", "custom"): lambda b: _super_with_prefix_records(
        V.super_chunks, b, 2048, 4096, 32768),
}

_KEYS = sorted(json.loads(
    (pathlib.Path(__file__).parent / "golden" / "golden.json").read_text()))


@pytest.mark.parametrize("key", _KEYS)
def test_vectorized_matches_rust(key, golden, fixture_bytes):
    fixture, algo, suffix = key.split("/")
    buf = fixture_bytes(fixture)
    got = CASE_RUNNERS[(algo, suffix)](buf)
    expected = [tuple(c) for c in golden[key]]
    assert [tuple(c) for c in got] == expected
