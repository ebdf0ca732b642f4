"""Vectorized (numpy) CDC kernels — the production path for pandas/Arrow UDFs.

Each function is boundary-identical to its scalar oracle in
``rust_chunking_spark.kernels.scalar`` (itself golden-tested against the actual
Rust reference, see tests/golden). The vectorization strategy per kernel:

  AE/RAM  running max via np.maximum.accumulate per chunk window; cut candidates
          from a closed-form condition on the last-argmax index (ae.rs:38-70,
          ram.rs:36-68).
  Rabin   the rolling hash at test positions is window-local (the 16-byte window
          is always saturated by the time chunk_len >= min), so checksums for
          the WHOLE buffer are precomputed as 16 shifted multiply-adds; the
          chunk loop is a searchsorted over precomputed cut candidates
          (rabin.rs:78-123).
  Super   the staged-mask tests only read the low 12 bits of the gear
          fingerprint, which depend on at most the last 6 byte-pairs plus a
          seed term — closed form over pair arrays (supercdc.rs:79-154);
          record-map/shelved logic stays a cheap per-chunk Python loop.
  Ultra   distances at every slide step are prefix-sum algebra over the
          BYTE_DISTANCES LUT; equal-window runs via run-length scans
          (ultra.rs:82-185).
  Seq     comparisons are a global sign(diff) array; cut = 5th
          monotone-comparison since last opposing, skip = 55th opposing —
          both found with run-length tricks over the non-Equal subsequence
          (seq.rs:71-118).
  Leap    window qualification Q[e] for all positions via 5 LUT gathers; the
          24-window satisfaction test is a sliding AND; leap sizes precomputed;
          the remaining pointer-chase is O(hops) (leap_based.rs:45-128).
"""

from __future__ import annotations

import numpy as np

from . import scalar
from ._tables import BYTE_DISTANCES, EF_MATRIX, GEAR, GEAR_LS

U64 = np.uint64(0xFFFFFFFFFFFFFFFF)

_EMPTY = np.empty((0, 2), dtype=np.int64)


def _as_u8(buf) -> np.ndarray:
    if isinstance(buf, np.ndarray) and buf.dtype == np.uint8:
        return buf
    return np.frombuffer(bytes(buf), dtype=np.uint8)


def _pack(chunks: list[tuple[int, int]]) -> np.ndarray:
    if not chunks:
        return _EMPTY
    return np.asarray(chunks, dtype=np.int64)


# ---------------------------------------------------------------- AE and RAM


def _extremum_scan(a: np.ndarray):
    """Running max over a; upd[p] True where the scan updates its max (ties update)."""
    m = np.maximum.accumulate(a)
    return a == m


def _first_ae_candidate(a: np.ndarray, window_size: int) -> int:
    """First index p in a with (a[p] != runmax[p]) and p == last_update + window."""
    upd = a == np.maximum.accumulate(a)
    idx = np.arange(len(a))
    lu = np.maximum.accumulate(np.where(upd, idx, 0))
    cand = np.flatnonzero((~upd) & (idx == lu + window_size))
    return int(cand[0]) if len(cand) else -1


def ae_chunks(buf, min_size: int = 8192, max_size: int = 16384,
              window_size: int = 32) -> np.ndarray:
    b = _as_u8(buf)
    n = len(b)
    out = []
    cs = 0
    grow0 = 4 * window_size  # adaptive: most cuts land near the chunk start
    while cs < n:
        if n - cs < min_size:
            out.append((cs, n - cs))
            break
        base = cs + 1
        hi_full = min(n, cs + max_size + 2)  # hard cut fires at pos == cs+max+1
        w = grow0
        cut = -1
        while True:
            hi = min(hi_full, base + w)
            c = _first_ae_candidate(b[base:hi], window_size)
            # a candidate within w - window_size is final (later context can't
            # retract it: the scan state at p only depends on a[0..p])
            if c >= 0:
                cut = c
                break
            if hi == hi_full:
                break
            w *= 4
        if hi_full == cs + max_size + 2:
            cut_rel = max_size if cut < 0 else min(cut, max_size)
            pos = base + cut_rel
        else:
            pos = n if cut < 0 else base + cut
        out.append((cs, pos - cs))
        cs = pos
    return _pack(out)


def ram_chunks(buf, min_size: int = 8192, max_size: int = 16384,
               window_size: int = 32) -> np.ndarray:
    b = _as_u8(buf)
    n = len(b)
    out = []
    cs = 0
    grow0 = 4 * window_size
    while cs < n:
        if n - cs < min_size:
            out.append((cs, n - cs))
            break
        base = cs + 1
        hi_full = min(n, cs + max_size + 2)
        w = grow0
        cut = -1
        while True:
            hi = min(hi_full, base + w)
            a = b[base:hi]
            upd = a == np.maximum.accumulate(a)
            cand = np.flatnonzero(upd[window_size:])
            if len(cand):
                cut = int(cand[0]) + window_size
                break
            if hi == hi_full:
                break
            w *= 4
        if hi_full == cs + max_size + 2:
            cut_rel = max_size if cut < 0 else min(cut, max_size)
            pos = base + cut_rel
        else:
            pos = n if cut < 0 else base + cut
        out.append((cs, pos - cs))
        cs = pos
    return _pack(out)


# ---------------------------------------------------------------------- Rabin

_RABIN_POWS = np.empty(16, dtype=np.uint64)
_p = 1
for _k in range(16):
    _RABIN_POWS[_k] = _p
    _p = (_p * scalar.RABIN_PRIME) & scalar.RABIN_MASK
del _p, _k


# The cut test only reads checksum & 0x3FFF, so all arithmetic can run mod 2^14:
# (x mod 2^40) mod 2^14 == x mod 2^14. Precompute per-k byte contribution LUTs
# (byte * PRIME^k mod 2^14) and accumulate in int32 — 4x less memory traffic
# than the u64 formulation.
_RABIN_POWS14 = [int(p) & 0x3FFF for p in _RABIN_POWS]
_RABIN_IR14 = (scalar._RABIN_IR & np.uint64(0x3FFF)).astype(np.int32)


def _rabin_cut_positions(b: np.ndarray) -> np.ndarray:
    """All buffer positions p where (H(p) ^ ir[b[p-16]]) & CUT_MASK == 0.

    H(p) = sum_{k=0..15} b[p-k] * PRIME^k mod 2^40 — exact because the cut test
    only fires after >= 64 iterations, when the circular window is saturated
    (rabin.rs:96-119); only the low 14 bits (CUT_MASK) are needed.
    """
    n = len(b)
    if n < 17:
        return np.empty(0, dtype=np.int64)
    bi = b.astype(np.int32)
    h = np.zeros(n - 16, dtype=np.int32)         # h[j] = H(p) & 0x3FFF, p = j + 16
    for k in range(16):
        h += bi[16 - k:n - k] * _RABIN_POWS14[k]
    checksum = (h & 0x3FFF) ^ _RABIN_IR14[b[:n - 16]]
    flags = (checksum & scalar.RABIN_CUT_MASK) == 0
    return np.flatnonzero(flags).astype(np.int64) + 16


def rabin_chunks(buf, min_size: int = 16384, max_size: int = 65536) -> np.ndarray:
    b = _as_u8(buf)
    n = len(b)
    cuts = _rabin_cut_positions(b)
    out = []
    cs = 0
    while cs < n:
        if n - cs < min_size:
            out.append((cs, n - cs))
            break
        lo = cs + min_size - 1
        p_limit = min(cs + max_size - 1, n - 1)
        i = np.searchsorted(cuts, lo)
        if i < len(cuts) and cuts[i] <= p_limit:
            length = int(cuts[i]) - cs + 1
        elif cs + max_size - 1 <= n - 1:
            length = max_size
        else:
            length = n - cs
        out.append((cs, length))
        cs += length
    return _pack(out)


# ------------------------------------------------------------------- SuperCDC

_SHIFTS_1_15 = np.arange(15, 0, -1, dtype=np.uint64)
_M12 = np.int64(0xFFF)
_GEAR12 = (GEAR & np.uint64(0xFFF)).astype(np.int16)
_GEAR12_LS = (GEAR_LS & np.uint64(0xFFF)).astype(np.int16)
_SEED_SHIFTS = np.arange(15, 0, -1)


_SUPER_BLOCK = 4096  # pairs per block: covers the typical cut distance in one
#                      block while capping wasted scan when cuts come early


def _super_find_border_vec(b: np.ndarray, off: int, total: int, min_size: int,
                           avg_size: int, max_size: int
                           ) -> tuple[int, int] | None:
    """Vectorized find_border over the slice b[off:]; returns (gear, length).

    Processes byte-pairs in blocks with early exit; the low-12-bit fingerprint
    L(t) is a closed form over the last 6 pair-gears plus a seed term
    (supercdc.rs:96-147).
    """
    slice_len = total - off
    if slice_len == 0:
        return None
    if slice_len < min_size:
        return (0, slice_len)
    remaining = min(max_size, slice_len)
    center = min(avg_size, slice_len)

    seed12 = int((_GEAR12[b[off + min_size - 15:off + min_size]].astype(np.int64)
                  << _SEED_SHIFTS).sum()) & 0xFFF
    t0 = min_size // 2 + 15
    c2 = center // 2
    r2 = remaining // 2
    if t0 >= r2:
        return (0, remaining)

    bflag = False
    bpos = remaining
    bgear = 0
    B0 = t0
    while B0 < r2:
        B1 = min(r2, B0 + _SUPER_BLOCK)
        lo = max(t0, B0 - 5)                     # history needed for the 6-term sum
        t = np.arange(lo, B1)
        u12 = _GEAR12_LS[b[off + 2 * lo:off + 2 * B1:2]].astype(np.int64)
        v12 = _GEAR12[b[off + 2 * lo + 1:off + 2 * B1:2]].astype(np.int64)
        w = (u12 + v12) & _M12
        L = w.copy()
        for j in range(1, 6):
            L[j:] = (L[j:] + (w[:-j] << (2 * j))) & _M12
        if lo == t0:
            k6 = min(6, len(L))
            L[:k6] = (L[:k6] + (seed12 << (2 * np.arange(1, k6 + 1)))) & _M12
        Le = (L - v12) & _M12
        s = B0 - lo                              # drop warm-up rows
        t, L, Le, v12 = t[s:], L[s:], Le[s:], v12[s:]

        in_phase1 = t < c2
        even_mask = np.where(in_phase1, scalar.SUPER_MASK_S_LS,
                             scalar.SUPER_MASK_L_LS)
        odd_mask = np.where(in_phase1, scalar.SUPER_MASK_S, scalar.SUPER_MASK_L)
        even_hit = (Le & even_mask) == 0
        odd_hit = (L & odd_mask) == 0
        cand = np.flatnonzero(even_hit | odd_hit)
        first_cut = int(cand[0]) if len(cand) else -1

        if not bflag:
            ph2 = ~in_phase1
            b_even = ph2 & ((Le & scalar.SUPER_MASK_B_LS) == 0)
            b_odd = ph2 & ((L & scalar.SUPER_MASK_B) == 0)
            bc = np.flatnonzero(b_even | b_odd)
            if len(bc) and (first_cut < 0 or bc[0] < first_cut):
                k = int(bc[0])
                tk = B0 + k
                if b_even[k]:
                    bpos = 2 * tk
                    bgear = int(GEAR_LS[b[off + 2 * tk]])
                else:
                    bpos = 2 * tk + 1
                    bgear = int(GEAR[b[off + 2 * tk + 1]])
                bflag = True

        if first_cut >= 0:
            tk = B0 + first_cut
            if even_hit[first_cut]:
                return (int(GEAR_LS[b[off + 2 * tk]]), 2 * tk)
            return (int(GEAR[b[off + 2 * tk + 1]]), 2 * tk + 1)
        B0 = B1
    return (bgear, bpos) if bflag else (0, remaining)


def super_chunks(buf, min_size: int = 4096, avg_size: int = 8192,
                 max_size: int = 65536,
                 records: dict[int, int] | None = None) -> np.ndarray:
    b = _as_u8(buf)
    n = len(b)
    recs = {} if records is None else records
    out = []
    pos = 0
    shelved = None
    last_hash = 0
    record_last_hash = False
    while True:
        if shelved is not None:
            out.append((pos, shelved))
            pos += shelved
            shelved = None
            continue
        found = _super_find_border_vec(b, pos, n, min_size, avg_size, max_size)
        if found is None:
            break
        hash_, length = found
        out.append((pos, length))
        pos += length
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
    return _pack(out)


# ------------------------------------------------------------------- UltraCDC

ULTRA_MASK_S = scalar.ULTRA_MASK_S
ULTRA_MASK_L = scalar.ULTRA_MASK_L


def ultra_chunks(buf, min_size: int = 2048, normal_size: int = 10240,
                 max_size: int = 65536) -> np.ndarray:
    b = _as_u8(buf)
    n = len(b)
    bd = BYTE_DISTANCES[b] if n else BYTE_DISTANCES[:0]
    C = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(bd)])
    J = np.arange(8)
    BLOCK = 768   # windows per evaluation block; cuts usually land early
    out = []
    start = 0
    eq_count = 0  # persists across chunks (ultra.rs quirk: never reset in make_chunk)
    # first k with chk_len = min+8+8k >= max  -> phase-2 loop exits (make_chunk(0))
    k_max = max(0, -(-(max_size - min_size - 8) // 8))
    while start != n:
        if start + min_size + 8 >= n:
            out.append((start, n - start))
            break
        # first k where check_border fires BEFORE reading window k
        k_border = max(0, -(-(n - start - min_size - 16) // 8))
        K = min(k_max, k_border)       # windows actually read: k = 0..K-1
        cut_k = -1
        run = eq_count
        B0 = 0
        while B0 < K:
            B1 = min(K, B0 + BLOCK)
            ks = np.arange(B0, B1)
            Qo = start + min_size + 8 + 8 * ks
            Po = np.where(ks == 0, start, Qo - 8)
            eq = (b[Qo[:, None] + J] == b[Po[:, None] + J]).all(axis=1)
            # distance before slide step j of window k:
            #   D_kj = S(prev) + (C[Q+j]-C[Q]) - (C[P+j]-C[P])
            S_prev = C[Po + 8] - C[Po]
            D = (S_prev[:, None] + C[Qo[:, None] + J] - C[Qo][:, None]
                 - C[Po[:, None] + J] + C[Po][:, None])
            chk_at = min_size + 8 + 8 * ks
            mask_k = np.where(chk_at < normal_size, ULTRA_MASK_S, ULTRA_MASK_L)
            hit = ((D & mask_k[:, None]) == 0).any(axis=1) & ~eq
            hit_idx = np.flatnonzero(hit)
            first_hit = int(hit_idx[0]) if len(hit_idx) else B1 - B0
            # LEST: eq-run (with carry-in) reaches exactly 64 at an eq window
            lest_local = -1
            if run + int(eq[:first_hit].sum()) >= scalar.ULTRA_LEST:
                rr = run
                for k in range(first_hit):
                    if eq[k]:
                        rr += 1
                        if rr == scalar.ULTRA_LEST:
                            lest_local = k
                            break
                    else:
                        rr = 0
            if lest_local >= 0:
                cut_k = B0 + lest_local
                eq_count = scalar.ULTRA_LEST   # count stays at 64 (quirk)
                break
            if first_hit < B1 - B0:
                cut_k = B0 + first_hit
                eq_count = 0                   # cut at a non-eq window
                break
            run = _eq_run_end(eq, B1 - B0, run, inclusive=False)
            B0 = B1

        if cut_k >= 0:
            length = min_size + 8 + 8 * cut_k + 8   # make_chunk(8)
            out.append((start, length))
            start += length
        elif k_max <= k_border:
            # phase-2 while condition (chk_len < max) fails first -> make_chunk(0)
            eq_count = run
            out.append((start, min_size + 8 + 8 * k_max))
            start += min_size + 8 + 8 * k_max
        else:
            # check_border fires -> emit remainder, iteration ends
            eq_count = run
            out.append((start, n - start))
            start = n
    return _pack(out)


def _eq_run_end(eq: np.ndarray, k: int, carry: int, inclusive: bool = True) -> int:
    """equal_window_count after processing windows [0, k] (or [0, k) )."""
    end = k + 1 if inclusive else k
    if end <= 0:
        return carry
    seg = eq[:end]
    nz = np.flatnonzero(~seg)
    if len(nz) == 0:
        return carry + end
    run = end - 1 - int(nz[-1])
    if inclusive and not seg[end - 1]:
        return 0
    return run


# ------------------------------------------------------------------------ Seq


def seq_chunks(buf, min_size: int = 4096, max_size: int = 16384,
               increasing: bool = True, sequence_length: int = 5,
               skip_trigger: int = 55, skip_size: int = 256) -> np.ndarray:
    b = _as_u8(buf)
    n = len(b)
    if n == 0:
        return _EMPTY
    d = np.sign(b[1:].astype(np.int16) - b[:-1].astype(np.int16))
    if not increasing:
        d = -d
    # non-Equal comparison indices (comparison at index i compares b[i] vs b[i-1])
    ne_idx = np.flatnonzero(d != 0) + 1
    ne_isG = d[ne_idx - 1] > 0
    # G-run lengths over the non-E subsequence
    out = []
    cs = 0
    while cs < n:
        if n - cs < min_size:
            out.append((cs, n - cs))
            break
        position = cs + min_size
        cut_len = None
        while True:
            # segment [position+1 .. limit] of iterations; comparison idx = p-1
            i_lo = position          # first comparison index = position (p-1 for p=position+1)
            i_hi = min(n, cs + max_size) - 1   # last comparison index
            if i_lo > i_hi:
                break
            a = np.searchsorted(ne_idx, i_lo)
            z = np.searchsorted(ne_idx, i_hi, side="right")
            isG = ne_isG[a:z]
            ev = ne_idx[a:z]
            if len(ev) == 0:
                position = i_hi + 1
                break
            # cut: 5th G since last L (within segment)
            notG = np.flatnonzero(~isG)
            # run length of G ending at j
            runstart = np.zeros(len(isG), dtype=np.int64)
            if len(notG):
                runstart[notG] = notG + 1
                runstart = np.maximum.accumulate(runstart)
            runlen = np.arange(1, len(isG) + 1) - runstart
            cutj = np.flatnonzero(isG & (runlen >= sequence_length))
            cut_j = int(cutj[0]) if len(cutj) else len(ev)
            skip_j = int(notG[skip_trigger - 1]) if len(notG) >= skip_trigger else len(ev)
            if cut_j < skip_j:
                cut_len = int(ev[cut_j]) + 1 - cs
                break
            if skip_j < len(ev):
                position = int(ev[skip_j]) + 1 + skip_size
                if position >= n or position - cs >= max_size:
                    break
                continue
            position = i_hi + 1
            break
        if cut_len is None:
            if position > n:
                position = n
            cut_len = position - cs
        out.append((cs, cut_len))
        cs += cut_len
    return _pack(out)


# ----------------------------------------------------------------- Leap-based

ULTRA_MASK_S = scalar.ULTRA_MASK_S
ULTRA_MASK_L = scalar.ULTRA_MASK_L

_EF_COLS = [EF_MATRIX[:, k].copy() for k in range(5)]
_LEAP_OFFS = [1 + 42 * k for k in range(5)]   # byte at e - off


def _leap_tables(b: np.ndarray):
    """Q[e] (window ending at e qualified) and leap[e] for e in [180, n]."""
    n = len(b)
    if n < scalar.LEAP_WINDOW_SIZE:
        return None, None, scalar.LEAP_WINDOW_SIZE
    e0 = scalar.LEAP_WINDOW_SIZE
    acc = _EF_COLS[0][b[e0 - 1:n]]
    for k in range(1, 5):
        acc = acc ^ _EF_COLS[k][b[e0 - 1 - 42 * k:n - 42 * k]]
    Q = acc != 0                               # Q[j] for e = e0 + j, e in [e0, n]
    notQ = ~Q
    # R[p]: all windows ending at p-i (i=0..23) qualified, defined for p >= e0+23
    S = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(notQ)])
    # for p = e0+23+m: windows e in [p-23, p] -> Q idx [m, m+24)
    R = (S[24:] - S[:-24]) == 0                # R[m] for p = e0+23+m
    # leap[p]: check order i=2..23 then i=0..1; first unqualified -> leap size
    nm = len(R)
    leap = np.zeros(nm, dtype=np.int64)
    rem = ~R
    # primary: i in 2..23 -> Q idx m + 23 - i ; leap = 24 - i
    for i in range(2, 24):
        sel = rem & notQ[23 - i:23 - i + nm]
        leap[sel] = 24 - i
        rem = rem & ~sel
    for i in range(2):
        sel = rem & notQ[23 - i:23 - i + nm]
        leap[sel] = 22 - i
        rem = rem & ~sel
    return R, leap, e0 + 23


def leap_chunks(buf, min_size: int = 8192, max_size: int = 16384) -> np.ndarray:
    b = _as_u8(buf)
    n = len(b)
    R, leap, p0 = _leap_tables(b)
    out = []
    position = min_size
    chunk_start = 0
    has_cut = False
    Rl = R.tolist() if R is not None else None
    leapl = leap.tolist() if leap is not None else None
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
            m = position - p0
            if Rl[m]:
                out.append((chunk_start, position - chunk_start))
                chunk_start = position
                position += min_size
                emitted = True
                break
            position += leapl[m]
        if not emitted:
            position = n
            has_cut = True
            out.append((chunk_start, position - chunk_start))
    return _pack(out)


ALGORITHMS = {
    "ae": ae_chunks,
    "ram": ram_chunks,
    "rabin": rabin_chunks,
    "seq": seq_chunks,
    "super": super_chunks,
    "ultra": ultra_chunks,
    "leap": leap_chunks,
}
