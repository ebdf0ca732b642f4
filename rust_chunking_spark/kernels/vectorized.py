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
#
# Both kernels reduce to the same global structure. Within a chunk starting
# at cs (scan base = cs + 1, first-byte skip ae.rs:48-50):
#
#   AE  cuts at q + 32 for the first q >= base that is a chunk-record
#       (no element > b[q] in [base, q), ties count as updates) AND has no
#       update in the next 32 bytes (max(b[q+1 .. q+32]) < b[q], strict).
#   RAM cuts at the first q >= base + window that is a chunk-record
#       (a[j] == running max <=> no element > b[q] in [base, q)).
#
# The "chunk-record" test is position-independent once expressed through
# PG[q] = index of the previous STRICTLY greater element: record <=> PG < base.
# So chunking the whole buffer becomes: (1) one vectorized pass computing the
# candidate positions (a sliding-window-max condition), (2) one vectorized
# prev-greater computation at the candidates (binary descent over a sparse
# max-table), (3) a pure-python pointer chase emitting chunks — no per-chunk
# numpy calls at all.


def _sparse_max_tables(b: np.ndarray, levels: int) -> list:
    """tables[k][x] = max(b[x : x + 2**k]); built by doubling."""
    tables = [b]
    for k in range(1, levels + 1):
        prev = tables[-1]
        step = 1 << (k - 1)
        if len(prev) <= step:
            tables.append(prev[:0])
            break
        tables.append(np.maximum(prev[:-step], prev[step:]))
    return tables


def _sliding_max(b: np.ndarray, tables: list, w: int) -> np.ndarray:
    """A[x] = max(b[x : x + w]) for x in [0, n - w]; two overlapping
    power-of-two windows from the sparse tables (max is idempotent)."""
    n = len(b)
    k = w.bit_length() - 1
    if (1 << k) == w:
        return tables[k][:n - w + 1]
    step = 1 << k
    Mk = tables[k]
    hi = n - w + 1
    return np.maximum(Mk[:hi], Mk[w - step:w - step + hi])


def _prev_greater_at(b: np.ndarray, cand: np.ndarray, tables: list,
                     levels: int) -> np.ndarray:
    """PG[q] for each candidate: largest x < q with b[x] > b[q].

    Exact while the distance fits the table span; a farther PG collapses to
    some value < q - (2**(levels+1) - 1), which callers only compare against
    chunk bases closer than that span — the comparison stays correct.
    """
    v = b[cand]
    x = cand.astype(np.int64)
    for k in range(min(levels, len(tables) - 1), -1, -1):
        step = 1 << k
        Mk = tables[k]
        if len(Mk) == 0:
            continue   # buffer shorter than this window width: no x qualifies
        can = x - step >= 0
        idx = np.where(can, x - step, 0)
        ok = can & (Mk[idx] <= v)
        x = np.where(ok, x - step, x)
    return x - 1


def _extremum_chain(b, cands: np.ndarray, pgs: np.ndarray, min_size: int,
                    max_size: int, cut_off: int, q_off: int) -> list:
    """Shared AE/RAM chunk loop over precomputed candidates.

    cut position = candidate + cut_off; first admissible candidate per chunk
    is >= base + q_off (AE: cut_off=32, q_off=0; RAM: cut_off=0, q_off=window).
    """
    n = len(b)
    qs = cands.tolist()
    pg = pgs.tolist()
    nq = len(qs)
    out = []
    cs = 0
    i0 = 0   # first candidate >= base + q_off; base is monotone across
    while cs < n:   # chunks, so i0 only ever advances: amortized O(nq) total
        if n - cs < min_size:
            out.append((cs, n - cs))
            break
        base = cs + 1
        while i0 < nq and qs[i0] < base + q_off:
            i0 += 1
        i = i0
        cutpos = -1
        while i < nq:
            if pg[i] < base:
                cutpos = qs[i] + cut_off
                break
            i += 1
        if cs + max_size + 2 <= n:
            pos = min(cutpos, cs + 1 + max_size) if cutpos >= 0 \
                else cs + 1 + max_size
        else:
            pos = cutpos if 0 <= cutpos < n else n
        out.append((cs, pos - cs))
        cs = pos
    return out


def ae_chunks(buf, min_size: int = 8192, max_size: int = 16384,
              window_size: int = 32) -> np.ndarray:
    b = _as_u8(buf)
    n = len(b)
    if n == 0:
        return _EMPTY
    levels = max(1, int(max_size + 2 * window_size + 2).bit_length())
    tables = _sparse_max_tables(b, levels)
    # candidate q: strict max over the NEXT window bytes (q+1 .. q+window);
    # windows crossing the buffer end can never fire inside the scan
    if n >= window_size + 1:
        A = _sliding_max(b, tables, window_size)   # A[x] = max b[x..x+w)
        m = n - window_size                        # q in [0, n-w-1]
        cands = np.flatnonzero(b[:m] > A[1:m + 1]).astype(np.int64)
    else:
        cands = np.empty(0, dtype=np.int64)
    pgs = _prev_greater_at(b, cands, tables, levels)
    return _pack(_extremum_chain(b, cands, pgs, min_size, max_size,
                                 cut_off=window_size, q_off=0))


def ram_chunks(buf, min_size: int = 8192, max_size: int = 16384,
               window_size: int = 32) -> np.ndarray:
    b = _as_u8(buf)
    n = len(b)
    if n == 0:
        return _EMPTY
    levels = max(1, int(max_size + 2 * window_size + 2).bit_length())
    tables = _sparse_max_tables(b, levels)
    # candidate q >= window: no strictly-greater element in the PREVIOUS
    # window bytes (b[q] >= max(b[q-window .. q)))
    if n >= window_size + 1:
        A = _sliding_max(b, tables, window_size)   # A[x] = max b[x..x+w)
        m = n - window_size                        # x = q - window
        cands = (np.flatnonzero(b[window_size:] >= A[:m]).astype(np.int64)
                 + window_size)
    else:
        cands = np.empty(0, dtype=np.int64)
    pgs = _prev_greater_at(b, cands, tables, levels)
    return _pack(_extremum_chain(b, cands, pgs, min_size, max_size,
                                 cut_off=0, q_off=window_size))


# ---------------------------------------------------------------------- Rabin

_RABIN_POWS = np.empty(16, dtype=np.uint64)
_p = 1
for _k in range(16):
    _RABIN_POWS[_k] = _p
    _p = (_p * scalar.RABIN_PRIME) & scalar.RABIN_MASK
del _p, _k


# The cut test only reads checksum & 0x3FFF, so all arithmetic can run mod
# 2^14, which 2^16 contains: (x mod 2^16) mod 2^14 == x mod 2^14. uint16
# accumulation with wraparound is therefore exact AND hits SIMD width 2x-4x
# harder than int32/u64 (measured ~7x faster on this box).
_RABIN_POWS16 = [np.uint16(int(p) & 0xFFFF) for p in _RABIN_POWS]
_RABIN_IR16 = (scalar._RABIN_IR & np.uint64(0x3FFF)).astype(np.uint16)


def _rabin_cut_positions(b: np.ndarray) -> np.ndarray:
    """All buffer positions p where (H(p) ^ ir[b[p-16]]) & CUT_MASK == 0.

    H(p) = sum_{k=0..15} b[p-k] * PRIME^k mod 2^40 — exact because the cut test
    only fires after >= 64 iterations, when the circular window is saturated
    (rabin.rs:96-119); only the low 14 bits (CUT_MASK) are needed.
    """
    n = len(b)
    if n < 17:
        return np.empty(0, dtype=np.int64)
    bu = b.astype(np.uint16)
    h = np.zeros(n - 16, dtype=np.uint16)        # h[j] = H(p) mod 2^16, p = j + 16
    for k in range(16):
        h += bu[16 - k:n - k] * _RABIN_POWS16[k]
    checksum = (h & np.uint16(0x3FFF)) ^ _RABIN_IR16[b[:n - 16]]
    flags = (checksum & np.uint16(scalar.RABIN_CUT_MASK)) == 0
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
# int32 tables: the whole per-block pipeline runs in int32 — the unmasked
# 6-term accumulation peaks below 2^25 and two's-complement & 0xFFF is mod
# 4096 for negatives, so deferring the mask is exact (see find_border)
_GEAR12 = (GEAR & np.uint64(0xFFF)).astype(np.int32)
_GEAR12_LS = (GEAR_LS & np.uint64(0xFFF)).astype(np.int32)
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

    # int32 fast path with DEFERRED masking: w is masked to 12 bits, the
    # 6-term accumulation is left unmasked (peak < 6 * 2^22 < 2^25), and the
    # hit tests `x & mask == 0` read only the low 12 bits, for which any
    # representative of x mod 4096 gives the same answer (two's-complement
    # & 0xFFF == mod 4096, negatives included — relevant for Le = L - v12).
    # Phase-1/phase-2 mask selection is a boundary SLICE, not an np.where:
    # within one block the phase flips at most once, at pair index c2.
    bflag = False
    bpos = remaining
    bgear = 0
    B0 = t0
    while B0 < r2:
        B1 = min(r2, B0 + _SUPER_BLOCK)
        lo = max(t0, B0 - 5)                     # history needed for the 6-term sum
        u12 = _GEAR12_LS[b[off + 2 * lo:off + 2 * B1:2]]
        v12 = _GEAR12[b[off + 2 * lo + 1:off + 2 * B1:2]]
        w = (u12 + v12) & 0xFFF
        L = w.copy()
        for j in range(1, 6):
            L[j:] += w[:-j] << (2 * j)
        if lo == t0:
            k6 = min(6, len(L))
            L[:k6] += (seed12 << (2 * np.arange(1, k6 + 1))).astype(np.int32)
        Le = L - v12
        s = B0 - lo                              # drop warm-up rows
        L, Le = L[s:], Le[s:]

        m = len(L)
        pb = min(max(c2 - B0, 0), m)             # phase boundary index
        hit = np.empty(m, dtype=bool)
        hit[:pb] = (((Le[:pb] & scalar.SUPER_MASK_S_LS) == 0)
                    | ((L[:pb] & scalar.SUPER_MASK_S) == 0))
        hit[pb:] = (((Le[pb:] & scalar.SUPER_MASK_L_LS) == 0)
                    | ((L[pb:] & scalar.SUPER_MASK_L) == 0))
        cand = np.flatnonzero(hit)
        first_cut = int(cand[0]) if len(cand) else -1

        if not bflag and pb < m:
            b_even = (Le[pb:] & scalar.SUPER_MASK_B_LS) == 0
            b_odd = (L[pb:] & scalar.SUPER_MASK_B) == 0
            bc = np.flatnonzero(b_even | b_odd)
            if len(bc) and (first_cut < 0 or pb + int(bc[0]) < first_cut):
                k = int(bc[0])
                tk = B0 + pb + k
                if b_even[k]:
                    bpos = 2 * tk
                    bgear = int(GEAR_LS[b[off + 2 * tk]])
                else:
                    bpos = 2 * tk + 1
                    bgear = int(GEAR[b[off + 2 * tk + 1]])
                bflag = True

        if first_cut >= 0:
            tk = B0 + first_cut
            even_mask = (scalar.SUPER_MASK_S_LS if first_cut < pb
                         else scalar.SUPER_MASK_L_LS)
            if (int(Le[first_cut]) & even_mask) == 0:
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

#: BYTE_DISTANCES (hamming counts, <= 8) as a 256-byte translate table
_BD_TABLE = bytes(BYTE_DISTANCES.astype(np.uint8).tolist())


def ultra_chunks(buf, min_size: int = 2048, normal_size: int = 10240,
                 max_size: int = 65536) -> np.ndarray:
    b = _as_u8(buf)
    n = len(b)
    bb = b.tobytes()
    # BYTE_DISTANCES via bytes.translate (C-speed LUT map, values <= 8).
    # All prefix arrays are uint16 with WRAPAROUND arithmetic: every use is
    # a difference over a span of <= 8 positions whose true value is <= 64
    # (distances) or <= 8 (counts), so the modular difference is exact —
    # and uint16 halves both the cumsum and the per-chunk gather traffic
    # vs int32 (~2x on the precompute, the dominant cost).
    C = np.zeros(n + 1, dtype=np.uint16)
    np.cumsum(np.frombuffer(bb.translate(_BD_TABLE), dtype=np.uint8),
              dtype=np.uint16, out=C[1:])
    J = np.arange(8)
    # Global precompute. For window k >= 1, Po = Qo - 8, so the distance at
    # slide step j collapses to a plain 8-byte window sum:
    #   D_kj = S(prev) + (C[Q+j]-C[Q]) - (C[P+j]-C[P]) = C[Q+j] - C[Q+j-8]
    # i.e. W8 at position Qo + j - 8 for j in [0, 8) -> the per-window hit
    # test is "any masked-zero W8 in [Qo-8, Qo)", a prefix-sum difference.
    # Same trick for eq: window k >= 1 is equal iff E[x] = (b[x] == b[x-8])
    # holds for all x in [Qo, Qo+8), another prefix-sum difference. Window
    # k == 0 has a detached Po and keeps the direct 2D evaluation.
    if n >= 8:
        W8 = C[8:] - C[:-8]          # W8[x] = sum bd[x .. x+8), x in [0, n-8]
        # prefix counts: PHX[j] = #{x < j : (W8[x] & MASK_X) == 0}
        PHS = np.zeros(len(W8) + 1, dtype=np.uint16)
        np.cumsum((W8 & np.uint16(ULTRA_MASK_S)) == 0, dtype=np.uint16,
                  out=PHS[1:])
        PHL = np.zeros(len(W8) + 1, dtype=np.uint16)
        np.cumsum((W8 & np.uint16(ULTRA_MASK_L)) == 0, dtype=np.uint16,
                  out=PHL[1:])
        # PE[j] = #{x in [8, j+8) : b[x] == b[x-8]}, shifted so that
        # count over x in [Qo, Qo+8) == PE[Qo] - PE[Qo-8]
        PE = np.zeros(n - 7, dtype=np.uint16)
        np.cumsum(b[8:] == b[:-8], dtype=np.uint16, out=PE[1:])
    BLOCK0 = 64   # adaptive block: cuts usually land early; grow 4x on miss
    out = []
    start = 0
    eq_count = 0  # persists across chunks (ultra.rs quirk: never reset in make_chunk)
    # first k with chk_len = min+8+8k >= max  -> phase-2 loop exits (make_chunk(0))
    k_max = max(0, -(-(max_size - min_size - 8) // 8))
    # first k whose check offset reaches normal_size: the S->L mask flips
    # exactly once per chunk, at this k — so the hit test SLICES at it
    # instead of gathering both prefix arrays and np.where-ing (halves the
    # fancy-index traffic, the dominant per-chunk cost)
    k_s = max(0, -(-(normal_size - min_size - 8) // 8))
    Q8 = 8 * np.arange(k_max, dtype=np.int64)   # per-call stride table
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
        BLOCK = BLOCK0
        while B0 < K:
            B1 = min(K, B0 + BLOCK)
            BLOCK *= 4
            Qo = start + min_size + 8 + Q8[B0:B1]
            # prefix-sum formulation for every window; k == 0 (detached Po)
            # overwritten with the direct evaluation below
            eq = (PE[Qo] - PE[Qo - 8]) == 8
            sb = min(max(k_s - B0, 0), B1 - B0)   # S/L mask boundary
            hit = np.empty(B1 - B0, dtype=bool)
            hit[:sb] = (PHS[Qo[:sb]] - PHS[Qo[:sb] - 8]) > 0
            hit[sb:] = (PHL[Qo[sb:]] - PHL[Qo[sb:] - 8]) > 0
            if B0 == 0:
                Po0 = start
                Qo0 = start + min_size + 8
                eq[0] = bool((b[Qo0:Qo0 + 8] == b[Po0:Po0 + 8]).all())
                # each parenthesized difference spans <= 8 positions, so the
                # uint16 modular subtraction is exact; cast to int64 BEFORE
                # combining (raw modular prefix values from distant positions
                # must never meet in a wider dtype)
                S_prev0 = int(np.uint16(C[Po0 + 8] - C[Po0]))
                D0 = (S_prev0
                      + (C[Qo0 + J] - C[Qo0]).astype(np.int64)
                      - (C[Po0 + J] - C[Po0]).astype(np.int64))
                m0 = (ULTRA_MASK_S if (min_size + 8) < normal_size
                      else ULTRA_MASK_L)
                hit[0] = bool(((D0 & m0) == 0).any())
            hit = hit & ~eq
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


def ultra_generate_chunks(buf, min_size: int = 2048, normal_size: int = 10240,
                          max_size: int = 65536) -> np.ndarray:
    """Ultra batch API (`generate_chunks`, ultra.rs:52-80).

    Boundary-identical to the iterator path for every non-empty buffer (the
    batch path's normal_size capping at ultra.rs:59-61 only matters when
    chk_len could reach the cap, which check_border pre-empts); the one
    observable difference is the small-buffer short-circuit (ultra.rs:55-57):
    an EMPTY buffer yields [(0, 0)] where the iterator yields nothing. The
    built-in contiguity assert (ultra.rs:66-69) is replicated.
    """
    b = _as_u8(buf)
    if len(b) == 0:
        return np.array([[0, 0]], dtype=np.int64)
    out = ultra_chunks(b, min_size, normal_size, max_size)
    assert (out[1:, 0] == out[:-1, 0] + out[:-1, 1]).all(), "non-contiguous"
    return out


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
    """SeqCDC with global run-length precompute (seq.rs:71-118).

    The per-segment scan state (G-run since segment start, opposing-slope
    count since segment start) is recovered from whole-buffer structures in
    O(log n) per segment instead of re-slicing per chunk:

    - a global cut candidate is any non-Equal comparison whose *global* G-run
      length reaches `sequence_length`; a segment-local cut is either the
      first global candidate whose run started inside the segment, or —
      when the first candidate's run straddles the segment start — event
      `a + L - 1` of the same run if the run extends that far, else the
      first candidate of a later run (which always starts inside).
    - the skip trigger is the (skip_trigger)'th not-G event at/after the
      segment start, a single index lookup into the not-G position array.
    """
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
    K = len(ne_idx)
    notG_pos = np.flatnonzero(~ne_isG)            # k-space indices of L events
    runstart = np.zeros(K, dtype=np.int64)
    if len(notG_pos):
        runstart[notG_pos] = notG_pos + 1
        np.maximum.accumulate(runstart, out=runstart)
    runlen = np.arange(1, K + 1) - runstart
    cutcand = np.flatnonzero(ne_isG & (runlen >= sequence_length))
    cand_rs = runstart[cutcand]                   # global run start per candidate
    L = sequence_length
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
            a = int(np.searchsorted(ne_idx, i_lo))
            z = int(np.searchsorted(ne_idx, i_hi, side="right"))
            if a >= z:
                position = i_hi + 1
                break
            # --- segment-local cut via global candidates
            c = int(np.searchsorted(cutcand, a))
            cut_k = K  # sentinel: none
            if c < len(cutcand):
                k0 = int(cutcand[c])
                if cand_rs[c] >= a:
                    cut_k = k0
                else:
                    # run straddles the segment start: first valid local cut
                    # is event a+L-1 if the run reaches it, else the first
                    # candidate of a later run
                    j = int(np.searchsorted(notG_pos, k0))
                    re = int(notG_pos[j]) if j < len(notG_pos) else K
                    if a + L - 1 < re:
                        cut_k = a + L - 1
                    else:
                        c2 = int(np.searchsorted(cutcand, re))
                        if c2 < len(cutcand):
                            cut_k = int(cutcand[c2])
            # --- segment-local skip trigger
            j = int(np.searchsorted(notG_pos, a))
            skip_k = (int(notG_pos[j + skip_trigger - 1])
                      if j + skip_trigger - 1 < len(notG_pos) else K)
            if cut_k < min(skip_k, z):
                cut_len = int(ne_idx[cut_k]) + 1 - cs
                break
            if skip_k < z:
                position = int(ne_idx[skip_k]) + 1 + skip_size
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

#: 256-byte translate tables, one per EF column: ``bytes.translate`` is a
#: C-speed LUT map, ~3x faster than numpy fancy-indexing for uint8->uint8
_EF_TABLES = [bytes(EF_MATRIX[:, k].tolist()) for k in range(5)]
_LEAP_OFFS = [1 + 42 * k for k in range(5)]   # byte at e - off


def _leap_steps(b: np.ndarray):
    """Per-position step table for the leap scan, packed as bytes.

    steps[m] for position p = e0+23+m: 0 => all 24 windows qualified (cut at
    p); else the leap size chosen by the reference's check order (primary
    i=2..23 -> leap 24-i, secondary i=0,1 -> leap 22-i, leap_based.rs:45-68).
    The first unqualified window in that order maps to the LAST not-qualified
    Q index in [m, m+21] (j -> leap j-m+1), else Q index m+23 (leap 22), else
    m+22 (leap 21), else cut.

    All-uint8 pipeline (~2.5x over the int32 arange/accumulate version on
    text): the five EF gathers are ``bytes.translate`` LUT maps, and the
    back-distance to the last notQ is a log-doubling saturated sliding min —
    d starts 0 at notQ / 200 elsewhere, five rounds of
    d[k:] = min(d[k:], d[:-k]+k) for k in 1,2,4,8,16 make it exact for
    distances <= 31 (we only test <= 21) and >= 32 stays > 21 with no uint8
    wrap (200 + 31 < 256). steps[m] = 22 - d[m+21] when d[m+21] <= 21.
    """
    n = len(b)
    if n < scalar.LEAP_WINDOW_SIZE:
        return None, scalar.LEAP_WINDOW_SIZE
    e0 = scalar.LEAP_WINDOW_SIZE
    bb = b.tobytes()
    acc = np.frombuffer(bb[e0 - 1:n].translate(_EF_TABLES[0]),
                        dtype=np.uint8).copy()
    for k in range(1, 5):
        acc ^= np.frombuffer(
            bb[e0 - 1 - 42 * k:n - 42 * k].translate(_EF_TABLES[k]),
            dtype=np.uint8)
    notQ = acc == 0                 # notQ[j] for window ending at e = e0 + j
    nq = len(notQ)
    nm = nq - 23                    # positions p = e0+23+m, m in [0, nm)
    if nm <= 0:
        return None, e0 + 23
    d = np.where(notQ, np.uint8(0), np.uint8(200))
    for k in (1, 2, 4, 8, 16):
        np.minimum(d[k:], d[:-k] + np.uint8(k), out=d[k:])
    dm = d[21:21 + nm]
    fb = np.where(notQ[23:23 + nm], np.uint8(22),
                  np.where(notQ[22:22 + nm], np.uint8(21), np.uint8(0)))
    steps = np.where(dm <= 21, np.uint8(22) - dm, fb)
    return steps.tobytes(), e0 + 23


def leap_chunks(buf, min_size: int = 8192, max_size: int = 16384) -> np.ndarray:
    b = _as_u8(buf)
    n = len(b)
    steps, p0 = _leap_steps(b)
    out = []
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
            s = steps[position - p0]
            if s == 0:
                out.append((chunk_start, position - chunk_start))
                chunk_start = position
                position += min_size
                emitted = True
                break
            position += s
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
