"""Property tests: vectorized == scalar on adversarial inputs + global invariants.

Invariants mirror the reference harness checks (filetest.rs:56-67): chunks are
contiguous and cover the buffer exactly. Equivalence tests give coverage beyond
the fixed golden corpus (runs, ramps, near-boundary lengths, tiny alphabets).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from rust_chunking_spark.kernels import scalar as S
from rust_chunking_spark.kernels import vectorized as V

# small sizes so hypothesis-scale buffers produce many chunks
SMALL = dict(min_size=256, max_size=1024)
PAIRS = [
    ("ae", lambda b: S.ae_chunks(b, **SMALL), lambda b: V.ae_chunks(b, **SMALL)),
    ("ram", lambda b: S.ram_chunks(b, **SMALL, window_size=16),
     lambda b: V.ram_chunks(b, **SMALL, window_size=16)),
    ("rabin", lambda b: S.rabin_chunks(b, 256, 4096),
     lambda b: V.rabin_chunks(b, 256, 4096)),
    ("seq_inc", lambda b: S.seq_chunks(b, 256, 1024, increasing=True),
     lambda b: V.seq_chunks(b, 256, 1024, increasing=True)),
    ("seq_dec", lambda b: S.seq_chunks(b, 256, 1024, increasing=False),
     lambda b: V.seq_chunks(b, 256, 1024, increasing=False)),
    ("super", lambda b: S.super_chunks(b, 256, 512, 2048),
     lambda b: V.super_chunks(b, 256, 512, 2048)),
    ("ultra", lambda b: S.ultra_chunks(b, 256, 512, 2048),
     lambda b: V.ultra_chunks(b, 256, 512, 2048)),
    ("leap", lambda b: S.leap_chunks(b, 512, 1024),
     lambda b: V.leap_chunks(b, 512, 1024)),
]
PAIR_IDS = [p[0] for p in PAIRS]


def buffers():
    rnd = st.binary(min_size=0, max_size=8192)
    tiny_alpha = st.builds(
        bytes, st.lists(st.sampled_from([0, 1, 2, 254, 255]), max_size=8192))
    runs = st.lists(
        st.tuples(st.integers(0, 255), st.integers(1, 600)), max_size=30
    ).map(lambda rs: b"".join(bytes([v]) * k for v, k in rs))
    ramp = st.integers(1, 20).map(
        lambda k: bytes(np.tile(np.arange(256, dtype=np.uint8), k)))
    return st.one_of(rnd, tiny_alpha, runs, ramp)


@pytest.mark.parametrize("name,scalar_fn,vec_fn", PAIRS, ids=PAIR_IDS)
@settings(max_examples=120, deadline=None)
@given(buf=buffers())
def test_vectorized_equals_scalar(name, scalar_fn, vec_fn, buf):
    got_s = [tuple(c) for c in scalar_fn(buf)]
    got_v = [tuple(c) for c in vec_fn(buf)]
    assert got_v == got_s


@pytest.mark.parametrize("name,scalar_fn,vec_fn", PAIRS, ids=PAIR_IDS)
@settings(max_examples=60, deadline=None)
@given(buf=buffers())
def test_invariants(name, scalar_fn, vec_fn, buf):
    chunks = [tuple(c) for c in vec_fn(buf)]
    # contiguity (filetest.rs:56-62) and exact coverage (filetest.rs:64-67)
    pos = 0
    for p, ln in chunks:
        assert p == pos
        pos += ln
    assert pos == len(buf)
    if name != "leap":  # leap emits a (0,0) chunk on empty input (quirk)
        assert all(ln > 0 for _, ln in chunks) or len(buf) == 0
