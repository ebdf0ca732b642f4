"""2->8 scaling triangulation (VERDICT r6 next #6): is the sub-0.8
2->8 replay pair bus-bound, or a hidden software cost?

Topology fact first: this box is ONE socket / ONE NUMA node (lscpu:
"NUMA node(s): 1", 32 cores, 1 thread/core) — there is no second memory
bus to separate core sets onto, so the literal "bus-separated core sets"
experiment cannot exist here. What CAN settle the question is workload
triangulation: three workloads of known memory intensity, pinned to the
SAME core sets bench.py's legs use (top-of-range, cpu0 excluded),
interleaved within one window so host drift hits every cell equally:

- cpu:    L2-resident numpy matmul, OMP pinned to 1 thread per proc —
          arithmetic throughput, approximately zero DRAM traffic.
- memcpy: 32 MB streaming copy per proc — pure DRAM bandwidth (STREAM).
- replay: the real CDC engine leg (bench.py --replay, cached WAL).

Verdict rule: if eff(replay) tracks eff(memcpy) and both sit well below
eff(cpu), the 2->8 number is the shared memory bus saturating beyond ~8
streaming threads — a single-host artifact that a real cluster (4x the
executors = 4x the memory buses) does not exhibit. If eff(replay) drops
well below eff(memcpy), there is a software cost to find.

The driver also measures memcpy on the LOW core range (1-8) vs the
default high range (24-31) to rule out core-region asymmetry.

Usage:
  python tools/bus_probe.py [--draws 2] [--skip-replay]   # driver, JSON
  taskset -c 30,31 python tools/bus_probe.py --probe cpu --procs 2
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NCPU = os.cpu_count() or 32


def _cpu_task(iters: int) -> None:
    import numpy as np
    a = np.random.default_rng(0).standard_normal((128, 128))
    b = np.random.default_rng(1).standard_normal((128, 128))
    for _ in range(iters):
        a @ b


def _memcpy_task(iters: int) -> None:
    import numpy as np
    src = np.zeros(32 * 1024 * 1024, dtype=np.uint8)
    dst = np.empty_like(src)
    for _ in range(iters):
        np.copyto(dst, src)


# iteration counts sized for a ~3-5 s timed region per cell: long enough
# to ride out scheduler jitter, short enough to interleave many cells in
# one quiet window (bench-host-noise: only interleaved ratios trust-worthy)
_TASKS = {"cpu": (_cpu_task, 12000), "memcpy": (_memcpy_task, 1200)}


def run_probe(probe: str, procs: int) -> float:
    """Aggregate ops/sec of `procs` workers (called under taskset)."""
    os.environ["OMP_NUM_THREADS"] = "1"
    task, iters = _TASKS[probe]
    with mp.Pool(procs) as pool:
        pool.map(task, [max(1, iters // 10)] * procs)       # warm
        t0 = time.perf_counter()
        pool.map(task, [iters] * procs)
        dt = time.perf_counter() - t0
    return procs * iters / dt


def _cpuset(c: int, low: bool = False) -> str:
    # same policy as bench.replay_at: top-of-range ids, cpu0 excluded
    return f"1-{c}" if low else (f"{NCPU - c}-{NCPU - 1}" if c > 1
                                 else str(NCPU - 1))


def _sub(probe: str, procs: int, low: bool = False) -> float:
    cmd = ["taskset", "-c", _cpuset(procs, low), sys.executable,
           os.path.abspath(__file__), "--probe", probe,
           "--procs", str(procs)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return float(out.stdout.strip().splitlines()[-1])


def _replay(procs: int, wal_dir: str, events: int) -> float:
    cmd = ["taskset", "-c", _cpuset(procs), sys.executable,
           os.path.join(REPO, "bench.py"), "--replay",
           "--cpus", str(procs), "--wal-dir", wal_dir,
           "--events", str(events)]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    line = [l for l in p.stdout.splitlines()
            if l.startswith("REPLAY_JSON:")]
    if not line:
        raise RuntimeError(p.stderr[-2000:])
    return json.loads(line[0][len("REPLAY_JSON:"):])["events_per_sec"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", choices=list(_TASKS))
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--draws", type=int, default=2)
    ap.add_argument("--skip-replay", action="store_true")
    ap.add_argument("--wal-dir", default=None)
    ap.add_argument("--events", type=int, default=1700000)
    args = ap.parse_args()

    if args.probe:                                   # worker mode
        print(run_probe(args.probe, args.procs))
        return 0

    wal = args.wal_dir
    if wal is None:
        cands = sorted(d for d in os.listdir("/dev/shm")
                       if d.startswith("bench-wal2-"))
        wal = os.path.join("/dev/shm", cands[-1]) if cands else None

    best: dict[str, float] = {}
    for d in range(args.draws):
        cells = [("cpu", 2, False), ("cpu", 8, False),
                 ("memcpy", 2, False), ("memcpy", 8, False),
                 ("memcpy", 8, True), ("memcpy", 2, True)]
        for probe, c, low in cells:
            key = f"{probe}{c}{'_low' if low else ''}"
            v = _sub(probe, c, low)
            best[key] = max(best.get(key, 0.0), v)
            print(f"draw{d} {key}: {v:.1f}", file=sys.stderr)
        if not args.skip_replay and wal and shutil.which("taskset"):
            for c in (2, 8):
                key = f"replay{c}"
                v = _replay(c, wal, args.events)
                best[key] = max(best.get(key, 0.0), v)
                print(f"draw{d} {key}: {v:.1f}", file=sys.stderr)

    def eff(hi: str, lo: str) -> float | None:
        if hi in best and lo in best:
            return round(best[hi] / best[lo] / 4, 3)
        return None

    out = {
        "topology": {"sockets": 1, "numa_nodes": 1,
                     "note": "single memory bus; no bus-separated sets"},
        "best": {k: round(v, 1) for k, v in best.items()},
        "eff_2to8": {
            "cpu": eff("cpu8", "cpu2"),
            "memcpy": eff("memcpy8", "memcpy2"),
            "memcpy_lowcores": eff("memcpy8_low", "memcpy2_low"),
            "replay": eff("replay8", "replay2"),
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
