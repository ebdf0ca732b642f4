"""filetest-parity CLI (see /root/reference/src/bin/filetest.rs:141-177).

Usage:
  python -m rust_chunking_spark.cli [-p PATH | -g SIZE_MB] [-d] ALGO
  ALGO in {ultra, leap, rabin, super, seq, ae, ram}

Chunks one buffer with the same per-algorithm parameter choices as the
reference CLI (filetest.rs:27-44, including the AE avg=8092 quirk), validates
contiguity + coverage (filetest.rs:56-67), prints avg / median / mode /
throughput (filetest.rs:69-88) and optional SHA3-256 dedup ratios
(filetest.rs:100-120).

Reference prints `lens[n/2]` of the UNSORTED list as "median"
(filetest.rs:81); both that value and the true median are printed.
"""

from __future__ import annotations

import argparse
import hashlib
import time
from collections import Counter

import numpy as np

from .kernels import vectorized as V

FILETEST_PARAMS = {
    "ultra": dict(min_size=2048, normal_size=10240, max_size=65536),
    "leap": dict(min_size=8192, max_size=16384),
    "rabin": dict(min_size=16384, max_size=65536),
    "super": dict(min_size=4096, avg_size=8192, max_size=65536),
    "seq": dict(min_size=4096, max_size=16384, increasing=True),
    "ae": dict(min_size=4096, max_size=16384),      # SizeParams(4096, 8092, 16384)
    "ram": dict(min_size=4096, max_size=16384, window_size=32),
}


def generate_data(size_mb: int, seed: int = 42) -> bytes:
    # reference uses unseeded rand::random (filetest.rs:122-125); we are
    # deterministic per TESTDATA.md philosophy
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size_mb << 20, dtype=np.uint8).tobytes()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    g = ap.add_mutually_exclusive_group()
    g.add_argument("-p", "--path", help="file to chunk")
    g.add_argument("-g", "--generate", type=int, metavar="SIZE_MB",
                   help="generate SIZE_MB MiB of random data")
    ap.add_argument("-d", "--dedup-ratio", action="store_true")
    ap.add_argument("algorithm", choices=sorted(FILETEST_PARAMS))
    args = ap.parse_args(argv)

    if args.generate is not None:
        buf = generate_data(args.generate)
    else:
        with open(args.path or "ubuntu.iso", "rb") as f:
            buf = f.read()
    print("Data preparation finished.")

    t0 = time.perf_counter()
    chunks = V.ALGORITHMS[args.algorithm](buf, **FILETEST_PARAMS[args.algorithm])
    dt = time.perf_counter() - t0

    # check_chunk_correctness + check_chunks_length (filetest.rs:56-67)
    pos = 0
    for p, ln in chunks:
        assert p == pos, "chunks not contiguous"
        pos += ln
    assert pos == len(buf), "chunks do not cover buffer"

    lens = [int(ln) for _, ln in chunks]
    print(f"Chunked file with size {len(buf) >> 20}MB in {dt:.3f}s")
    print(f"Average len: {sum(lens) // len(lens)} bytes")
    print(f"Median (reference lens[n/2], unsorted): {lens[len(lens) // 2]} bytes")
    print(f"Median (true): {sorted(lens)[len(lens) // 2]} bytes")
    print(f"Mode: {Counter(lens).most_common(1)[0][0]} bytes")
    print(f"Speed: {len(buf) / dt / 1e6:.1f} MB/s")

    if args.dedup_ratio:
        seen: dict[bytes, int] = {}
        for p, ln in chunks:
            seen[hashlib.sha3_256(buf[p:p + ln]).digest()] = int(ln)
        uniq_bytes = sum(seen.values())
        print(f"Chunk ratio (unique / all): {len(seen)} / {len(chunks)} "
              f"= {len(seen) / len(chunks):.3f}")
        print(f"Data size ratio: {uniq_bytes} / {len(buf)} "
              f"= {uniq_bytes / len(buf):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
