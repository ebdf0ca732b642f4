"""Scalar kernels vs golden boundaries generated from the actual Rust reference.

Golden fixtures: tests/golden/golden.json, produced by tools/gen_goldens.py
running tools/golden_gen (the reference code itself). A passing run means the
Python state machines produce *identical* (pos, len) chunk boundaries — the
correctness bar from BASELINE.json.
"""

import pytest

from rust_chunking_spark.kernels import scalar as K

# key suffix -> callable(buf) with the params golden_gen used
def _super_with_prefix_records(fn, b, mn, avg, mx):
    """Mirror golden_gen super_records: seed the record map by chunking the
    first half, then chunk the full buffer with the carried records
    (with_records/give_records, supercdc.rs:49-59, 156-158)."""
    recs = {}
    fn(bytes(b)[:len(b) // 2], mn, avg, mx, records=recs)
    return fn(b, mn, avg, mx, records=recs)


CASE_RUNNERS = {
    ("ae", "default"): lambda b: K.ae_chunks(b, 8192, 16384),
    ("ae", "filetest"): lambda b: K.ae_chunks(b, 4096, 16384),
    ("ram", "default"): lambda b: K.ram_chunks(b, 8192, 16384, 32),
    ("ram", "filetest"): lambda b: K.ram_chunks(b, 4096, 16384, 32),
    ("rabin", "default"): lambda b: K.rabin_chunks(b, 16384, 65536),
    ("rabin", "custom"): lambda b: K.rabin_chunks(b, 3000, 100000),
    ("rabin_zero", "unittest"): lambda b: K.rabin_chunks(
        b, 3000, 100000, tables=K.RABIN_ZERO_TABLES),
    ("seq", "inc"): lambda b: K.seq_chunks(b, 4096, 16384, increasing=True),
    ("seq", "dec"): lambda b: K.seq_chunks(b, 4096, 16384, increasing=False),
    ("super", "default"): lambda b: K.super_chunks(b, 4096, 8192, 65536),
    ("super", "custom"): lambda b: K.super_chunks(b, 2048, 4096, 32768),
    ("ultra", "default"): lambda b: K.ultra_chunks(b, 2048, 10240, 65536),
    ("ultra", "custom"): lambda b: K.ultra_chunks(b, 1024, 4096, 16384),
    ("leap", "default"): lambda b: K.leap_chunks(b, 8192, 16384),
    ("ultra_batch", "default"): lambda b: K.ultra_generate_chunks(
        b, 2048, 10240, 65536),
    ("ultra_batch", "custom"): lambda b: K.ultra_generate_chunks(
        b, 1024, 4096, 16384),
    ("super_records", "default"): lambda b: _super_with_prefix_records(
        K.super_chunks, b, 4096, 8192, 65536),
    ("super_records", "custom"): lambda b: _super_with_prefix_records(
        K.super_chunks, b, 2048, 4096, 32768),
}

# scalar kernels are slow; cap per-case input so the suite stays fast.
# vectorized kernels (test_golden_vectorized) cover every fixture in full.
SCALAR_BYTE_CAP = 600_000


def _golden_cases(golden):
    for key in sorted(golden):
        fixture, algo, suffix = key.split("/")
        yield key, fixture, (algo, suffix)


def test_all_cases_have_runners(golden):
    missing = {tuple(k.split("/")[1:]) for k in golden} - set(CASE_RUNNERS)
    assert not missing


@pytest.mark.parametrize("key", sorted(
    __import__("json").loads(
        (__import__("pathlib").Path(__file__).parent / "golden" / "golden.json")
        .read_text())))
def test_scalar_matches_rust(key, golden, fixture_bytes):
    fixture, algo, suffix = key.split("/")
    buf = fixture_bytes(fixture)
    if len(buf) > SCALAR_BYTE_CAP:
        pytest.skip("large fixture covered by vectorized golden test")
    got = CASE_RUNNERS[(algo, suffix)](buf)
    expected = [tuple(c) for c in golden[key]]
    assert [tuple(c) for c in got] == expected
