"""Exact scalar re-implementations of the reference CDC cut-point state machines.

These are the *semantic oracles*: slow, line-for-line-faithful Python versions of
the seven chunkers, validated against golden boundaries generated from the actual
Rust code (tests/golden/golden.json, via tools/golden_gen). The production path
is the vectorized kernels in ``rust_chunking_spark.kernels.vectorized``; property
tests assert vectorized == scalar on randomized inputs.

Semantics derived from (file:line cites into /root/reference/src):
  AE        ae.rs:38-85       (window_size hardcoded 32, ae.rs:34)
  RAM       ram.rs:36-83
  Rabin     rabin.rs:78-166   (CUT_MASK is compile-time 0x3FFF even for custom sizes)
  SeqCDC    seq.rs:71-188
  SuperCDC  supercdc.rs:61-188 (incl. record-map memoization + shelved replay)
  UltraCDC  ultra.rs:82-198   (iterator path; equal_window_count persists across chunks)
  Leap      leap_based.rs:38-128

Every quirk catalogued in SURVEY.md §2.1 (max off-by-one, min-not-a-floor,
first-byte skip, tail rules, MASK_S_LS typo, Leap zero-length chunk on empty
input) is intentional observable behavior and preserved.
"""

from __future__ import annotations

import numpy as np

from ._tables import BYTE_DISTANCES, EF_MATRIX, GEAR, GEAR_LS

U64 = 0xFFFFFFFFFFFFFFFF

# ---------------------------------------------------------------- size params

DEFAULT_SIZES = {
    "ae": (8192, 12288, 16384),       # ae.rs:3-4,17-23
    "ram": (8192, 12288, 16384),      # ram.rs:3-4,16-22
    "rabin": (16384, 32768, 65536),   # rabin.rs:10-12
    "seq": (4096, 8192, 16384),       # seq.rs:50-56
    "super": (4096, 8192, 65536),     # supercdc.rs:5-7
    "ultra": (2048, 10240, 65536),    # ultra.rs:3-6
    "leap": (8192, 12288, 16384),     # leap_based.rs:3-4,27-33
}


def _as_bytes(buf) -> bytes:
    if isinstance(buf, np.ndarray):
        return buf.tobytes()
    return bytes(buf)


# ------------------------------------------------------------------------- AE


def ae_chunks(buf, min_size: int = 8192, max_size: int = 16384,
              window_size: int = 32) -> list[tuple[int, int]]:
    """AE: cut at first p with buf[p] < running-max and p == max_pos + 32."""
    b = _as_bytes(buf)
    n = len(b)
    out: list[tuple[int, int]] = []
    pos = 0
    chunk_start = 0
    while pos < n:
        if n - pos < min_size:
            pos = n
        else:
            pos += 1
            max_value = b[pos]
            max_position = pos
            while pos < n:
                if pos - chunk_start > max_size:
                    break
                v = b[pos]
                if v < max_value:
                    if pos == max_position + window_size:
                        break
                else:
                    max_value = v
                    max_position = pos
                pos += 1
        out.append((chunk_start, pos - chunk_start))
        chunk_start = pos
    return out


# ------------------------------------------------------------------------ RAM


def ram_chunks(buf, min_size: int = 8192, max_size: int = 16384,
               window_size: int = 32) -> list[tuple[int, int]]:
    """RAM: after window_size bytes, cut at first byte >= running max."""
    b = _as_bytes(buf)
    n = len(b)
    out: list[tuple[int, int]] = []
    pos = 0
    chunk_start = 0
    while pos < n:
        if n - pos < min_size:
            pos = n
        else:
            pos += 1
            max_value = b[pos]
            while pos < n:
                length = pos - chunk_start
                if length > max_size:
                    break
                v = b[pos]
                if v >= max_value:
                    if length > window_size:
                        break
                    max_value = v
                pos += 1
        out.append((chunk_start, pos - chunk_start))
        chunk_start = pos
    return out


# ---------------------------------------------------------------------- Rabin

RABIN_PRIME = 153191
RABIN_MASK = 0x00FF_FFFF_FFFF
RABIN_FP_POLY = 0xBFE6_B8A5_BF37_8D83
RABIN_CUT_MASK = 0x3FFF          # (32K - 16K - 1): compile-time, size-independent
RABIN_WIN_SIZE = 16
RABIN_WIN_SLIDE_OFFSET = 64


def rabin_tables() -> tuple[np.ndarray, np.ndarray]:
    """Precompute out_map / ir tables (rabin.rs:140-166)."""
    poly_pow = 1
    for _ in range(RABIN_WIN_SIZE):
        poly_pow = (poly_pow * RABIN_PRIME) & RABIN_MASK
    out_map = np.zeros(256, dtype=np.uint64)
    ir = np.zeros(256, dtype=np.uint64)
    for i in range(256):
        out_map[i] = (i * poly_pow) & RABIN_MASK
        term, pw, val = 1, 1, 1
        for _ in range(RABIN_WIN_SIZE):
            if term & RABIN_FP_POLY:
                val = (val + ((pw * i) & RABIN_MASK)) & U64
            pw = (pw * RABIN_PRIME) & RABIN_MASK
            term <<= 1
        ir[i] = val
    return out_map, ir


_RABIN_OUT_MAP, _RABIN_IR = rabin_tables()
RABIN_ZERO_TABLES = (np.zeros(256, dtype=np.uint64), np.zeros(256, dtype=np.uint64))


def rabin_chunks(buf, min_size: int = 16384, max_size: int = 65536,
                 tables: tuple[np.ndarray, np.ndarray] | None = None
                 ) -> list[tuple[int, int]]:
    """Rabin rolling-hash CDC; cut when (hash ^ ir[out]) & 0x3FFF == 0 past min."""
    b = _as_bytes(buf)
    n = len(b)
    out_map, ir = tables if tables is not None else (_RABIN_OUT_MAP, _RABIN_IR)
    om = [int(x) for x in out_map]
    irl = [int(x) for x in ir]
    win_slide_pos = min_size - RABIN_WIN_SLIDE_OFFSET
    out: list[tuple[int, int]] = []
    pos = 0
    while pos < n:
        start = pos
        if n - pos < min_size:
            out.append((start, n - pos))
            pos = n
            break
        pos += win_slide_pos
        chunk_len = win_slide_pos
        win = [0] * RABIN_WIN_SIZE
        wi = 0
        h = 0
        while pos < n:
            ch = b[pos]
            o = win[wi]
            h = ((h * RABIN_PRIME) & RABIN_MASK) + ch
            h = (h - om[o]) & RABIN_MASK
            win[wi] = ch
            wi = (wi + 1) & (RABIN_WIN_SIZE - 1)
            chunk_len += 1
            pos += 1
            if chunk_len >= min_size:
                if ((h ^ irl[o]) & RABIN_CUT_MASK) == 0 or chunk_len >= max_size:
                    break
        out.append((start, chunk_len))
    return out


# ------------------------------------------------------------------------ Seq


def seq_chunks(buf, min_size: int = 4096, max_size: int = 16384,
               increasing: bool = True, sequence_length: int = 5,
               skip_trigger: int = 55, skip_size: int = 256
               ) -> list[tuple[int, int]]:
    """SeqCDC: cut after `sequence_length` strictly-monotone comparisons."""
    b = _as_bytes(buf)
    n = len(b)
    out: list[tuple[int, int]] = []
    position = 0
    while position < n:
        start = position
        if n - position < min_size:
            out.append((start, n - position))
            position = n
            break
        position += min_size
        chunk_len = min_size
        seq_len = 0
        opposing = 0
        while position < n and chunk_len < max_size:
            position += 1
            chunk_len += 1
            prev, prev2 = b[position - 1], b[position - 2]
            if prev < prev2:
                if increasing:
                    seq_len = 0
                    opposing += 1
                else:
                    seq_len += 1
            elif prev == prev2:
                continue
            else:
                if increasing:
                    seq_len += 1
                else:
                    seq_len = 0
                    opposing += 1
            if seq_len == sequence_length:
                break
            if opposing == skip_trigger:
                position += skip_size
                chunk_len += skip_size
                opposing = 0
        else:
            # loop exited on its condition (not break): clamp overshoot
            if position > n:
                delta = position - n
                position = n
                chunk_len -= delta
        out.append((start, chunk_len))
    return out


# ------------------------------------------------------------------- SuperCDC

SUPER_MASK_S = 0b1111_1111_1111
SUPER_MASK_L = 0b111_1111_1111
SUPER_MASK_B = 0b11_1111_1111
SUPER_MASK_S_LS = SUPER_MASK_B << 1   # supercdc.rs:14 -- typo'd but observable spec
SUPER_MASK_L_LS = SUPER_MASK_L << 1
SUPER_MASK_B_LS = SUPER_MASK_B << 1

_GEAR = [int(x) for x in GEAR]
_GEAR_LS = [int(x) for x in GEAR_LS]


def _super_find_border(b: bytes, off: int, total: int, min_size: int,
                       avg_size: int, max_size: int) -> tuple[int, int] | None:
    """find_border over the slice b[off:]; returns (gear_hash, length)."""
    slice_len = total - off
    if slice_len == 0:
        return None
    if slice_len < min_size:
        return (0, slice_len)
    remaining = min(max_size, slice_len)
    center = min(avg_size, slice_len)
    breakpoint_ = remaining
    breakpoint_flag = False
    breakpoint_gear = 0
    fingerprint = 0
    pos = min_size // 2
    for index in range(1, 16):
        fingerprint = (fingerprint + (_GEAR[b[off + min_size - index]] << index)) & U64
        pos += 1
    while pos < center // 2:
        a = pos * 2
        gear = _GEAR_LS[b[off + a]]
        fingerprint = ((fingerprint << 2) + gear) & U64
        if fingerprint & SUPER_MASK_S_LS == 0:
            return (gear, a)
        gear = _GEAR[b[off + a + 1]]
        fingerprint = (fingerprint + gear) & U64
        if fingerprint & SUPER_MASK_S == 0:
            return (gear, a + 1)
        pos += 1
    while pos < remaining // 2:
        a = pos * 2
        gear = _GEAR_LS[b[off + a]]
        fingerprint = ((fingerprint << 2) + gear) & U64
        if fingerprint & SUPER_MASK_L_LS == 0:
            return (gear, a)
        if not breakpoint_flag and fingerprint & SUPER_MASK_B_LS == 0:
            breakpoint_flag = True
            breakpoint_ = a
            breakpoint_gear = gear
        gear = _GEAR[b[off + a + 1]]
        fingerprint = (fingerprint + gear) & U64
        if fingerprint & SUPER_MASK_L == 0:
            return (gear, a + 1)
        if not breakpoint_flag and fingerprint & SUPER_MASK_B == 0:
            breakpoint_flag = True
            breakpoint_ = a + 1
            breakpoint_gear = gear
        pos += 1
    return (breakpoint_gear, breakpoint_)


def super_chunks(buf, min_size: int = 4096, avg_size: int = 8192,
                 max_size: int = 65536,
                 records: dict[int, int] | None = None
                 ) -> list[tuple[int, int]]:
    """SuperCDC gear-hash CDC with hash-record memoization (supercdc.rs:61-188)."""
    b = _as_bytes(buf)
    n = len(b)
    recs = {} if records is None else records
    out: list[tuple[int, int]] = []
    pos = 0
    shelved: int | None = None
    last_hash = 0
    record_last_hash = False
    while True:
        if shelved is not None:
            out.append((pos, shelved))
            pos += shelved
            shelved = None
            continue
        found = _super_find_border(b, pos, n, min_size, avg_size, max_size)
        if found is None:
            break
        hash_, length = found
        out.append((pos, length))
        pos += length
        # use_record_map (supercdc.rs:61-77)
        if record_last_hash:
            recs[last_hash] = length
        if hash_ in recs:
            record_last_hash = False
            fl = recs[hash_]
            if pos + fl < n:
                shelved = fl
        else:
            record_last_hash = True
        last_hash = hash_
    return out


# ------------------------------------------------------------------- UltraCDC

ULTRA_MASK_S = 0x2F
ULTRA_MASK_L = 0x2C
ULTRA_LEST = 64
_BD = [int(x) for x in BYTE_DISTANCES]


def ultra_chunks(buf, min_size: int = 2048, normal_size: int = 10240,
                 max_size: int = 65536) -> list[tuple[int, int]]:
    """UltraCDC via the Iterator path (ultra.rs:188-198): state persists across chunks."""
    b = _as_bytes(buf)
    n = len(b)
    out: list[tuple[int, int]] = []
    start = 0
    chk_len = min_size
    equal_window_count = 0  # NOT reset between chunks (ultra.rs: no reset in make_chunk)
    out_win = b""
    distance = 0

    def make_chunk(add_len: int) -> None:
        nonlocal start, chk_len
        chk_len += add_len
        out.append((start, chk_len))
        start += chk_len
        chk_len = min_size

    while start != n:
        # check_border (ultra.rs:174-185)
        if start + chk_len + 8 >= n:
            out.append((start, n - start))
            start = n
            break
        out_win = b[start:start + 8]
        chk_len += 8
        distance = sum(_BD[x] for x in out_win)
        cut = False
        for size_limit, mask in ((normal_size, ULTRA_MASK_S), (max_size, ULTRA_MASK_L)):
            while chk_len < size_limit:
                if start + chk_len + 8 >= n:
                    out.append((start, n - start))
                    start = n
                    cut = True
                    break
                in_win = b[start + chk_len:start + chk_len + 8]
                if in_win == out_win:
                    equal_window_count += 1
                    if equal_window_count == ULTRA_LEST:
                        make_chunk(8)
                        cut = True
                        break
                    chk_len += 8
                    continue
                equal_window_count = 0
                # try_extract (ultra.rs:134-144)
                hit = False
                for j in range(8):
                    if distance & mask == 0:
                        make_chunk(8)
                        hit = True
                        break
                    distance += _BD[in_win[j]] - _BD[out_win[j]]
                if hit:
                    cut = True
                    break
                out_win = in_win
                chk_len += 8
            if cut:
                break
        if not cut:
            make_chunk(0)
    return out


# ----------------------------------------------------------------- Leap-based

LEAP_WINDOW_PRIMARY = 22
LEAP_WINDOW_SECONDARY = 2
LEAP_WINDOW_COUNT = LEAP_WINDOW_PRIMARY + LEAP_WINDOW_SECONDARY
LEAP_WINDOW_SIZE = 180
LEAP_MATRIX_SHIFT = 42
_EF = EF_MATRIX.tolist()


def _leap_window_qualified(b: bytes, end: int) -> bool:
    """XOR-fold of EF_MATRIX over 5 sampled bytes of window b[end-180:end]."""
    acc = 0
    for k in range(5):
        acc ^= _EF[b[end - 1 - k * LEAP_MATRIX_SHIFT]][k]
    return acc != 0


def _leap_point_status(b: bytes, position: int) -> int:
    """0 if satisfied, else the leap size (leap_based.rs:45-68)."""
    for i in range(LEAP_WINDOW_SECONDARY, LEAP_WINDOW_COUNT):
        if not _leap_window_qualified(b, position - i):
            return LEAP_WINDOW_COUNT - i
    for i in range(LEAP_WINDOW_SECONDARY):
        if not _leap_window_qualified(b, position - i):
            return LEAP_WINDOW_COUNT - LEAP_WINDOW_SECONDARY - i
    return 0


def leap_chunks(buf, min_size: int = 8192, max_size: int = 16384
                ) -> list[tuple[int, int]]:
    """Leap-based CDC (leap_based.rs:80-128). Emits a (0,0) chunk on empty input."""
    b = _as_bytes(buf)
    n = len(b)
    out: list[tuple[int, int]] = []
    position = min_size
    chunk_start = 0
    has_cut = False
    while True:
        if position == n:
            if has_cut:
                break
            has_cut = True
            out.append((chunk_start, position - chunk_start))
            continue
        emitted = False
        while position < n:
            if position - chunk_start > max_size:
                out.append((chunk_start, position - chunk_start))
                chunk_start = position
                position += min_size
                emitted = True
                break
            leap = _leap_point_status(b, position)
            if leap == 0:
                out.append((chunk_start, position - chunk_start))
                chunk_start = position
                position += min_size
                emitted = True
                break
            position += leap
        if not emitted:
            position = n
            has_cut = True
            out.append((chunk_start, position - chunk_start))
    return out


def ultra_generate_chunks(buf, min_size: int = 2048,
                          normal_size: int = 10240,
                          max_size: int = 65536) -> list[tuple[int, int]]:
    """Ultra batch API (`generate_chunks`, ultra.rs:52-80): iterator-identical
    except the empty buffer -> [(0, 0)] (short-circuit, ultra.rs:55-57);
    contiguity asserted like ultra.rs:66-69."""
    b = _as_bytes(buf)
    if len(b) == 0:
        return [(0, 0)]
    out = ultra_chunks(b, min_size, normal_size, max_size)
    for (p0, l0), (p1, _l1) in zip(out, out[1:]):
        assert p0 + l0 == p1, "non-contiguous"
    return out


ALGORITHMS = {
    "ae": ae_chunks,
    "ram": ram_chunks,
    "rabin": rabin_chunks,
    "seq": seq_chunks,
    "super": super_chunks,
    "ultra": ultra_chunks,
    "leap": leap_chunks,
}
