"""Generate deterministic binary fixtures + golden (pos,len) boundaries.

Runs the REAL reference Rust code (via tools/golden_gen) on each fixture and
stores results in tests/golden/golden.json. This is the correctness spec for
the Python kernels (BASELINE.json: "identical chunk boundaries per algorithm
on fixed inputs").
"""
import json, pathlib, subprocess
import numpy as np

ROOT = pathlib.Path("/root/repo")
FIX = ROOT / "tests" / "fixtures"
GOLD = ROOT / "tests" / "golden"
FIX.mkdir(parents=True, exist_ok=True)
GOLD.mkdir(parents=True, exist_ok=True)
GEN = ROOT / "tools" / "golden_gen" / "target" / "release" / "golden_gen"

rng = np.random.default_rng(42)
fixtures = {}

fixtures["const1_1m"] = np.full(1 << 20, 1, dtype=np.uint8)
fixtures["const3_300k"] = np.full(300_000, 3, dtype=np.uint8)
fixtures["rand_256k"] = rng.integers(0, 256, 1 << 18, dtype=np.uint8)
fixtures["rand_1m"] = rng.integers(0, 256, 1 << 20, dtype=np.uint8)
# text-like: ascii letters + spaces/newlines, skewed
alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ETAOIN shrdlu<>/=\"\n\t", dtype=np.uint8)
fixtures["textish_512k"] = alpha[rng.integers(0, len(alpha), 1 << 19)]
# low-entropy runs: constant runs of random lengths (Ultra LEST, Seq Equal path)
runs = []
for _ in range(200):
    runs.append(np.full(int(rng.integers(64, 4096)), int(rng.integers(0, 256)), dtype=np.uint8))
fixtures["lowent_runs"] = np.concatenate(runs)
# sawtooth ramps (Seq monotone runs, AE/RAM extremum churn)
saw = np.concatenate([np.arange(256, dtype=np.uint8)] * 1024)
fixtures["sawtooth_256k"] = saw
fixtures["sawtooth_rev_256k"] = saw[::-1].copy()
# html-like template with point edits
base = (b"<html><head><title>page</title></head><body>" + b"<p>lorem ipsum dolor sit amet consectetur</p>" * 40 + b"</body></html>")
blocks = []
for i in range(300):
    b = bytearray(base)
    for _ in range(int(rng.integers(0, 6))):
        b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
    blocks.append(bytes(b))
fixtures["htmlish"] = np.frombuffer(b"".join(blocks), dtype=np.uint8)
# short/edge buffers
for n in [0, 1, 100, 2047, 2048, 2049, 4095, 4096, 4097, 8191, 8192, 8193, 16384, 16385]:
    fixtures[f"rand_{n}b"] = rng.integers(0, 256, n, dtype=np.uint8)

for name, arr in fixtures.items():
    (FIX / f"{name}.bin").write_bytes(arr.tobytes())

# (algo, golden_gen args, key-suffix)
CASES = [
    ("ae", [], "default"),
    ("ae", ["4096", "8092", "16384"], "filetest"),        # filetest.rs:38 (8092 quirk)
    ("ram", [], "default"),
    ("ram", ["4096", "8192", "16384", "32"], "filetest"), # filetest.rs:39-43
    ("rabin", [], "default"),
    ("rabin", ["3000", "50000", "100000"], "custom"),
    ("rabin_zero", ["3000", "50000", "100000"], "unittest"),  # rabin.rs:182-198
    ("seq", [], "inc"),
    ("seq", ["4096", "8192", "16384", "dec"], "dec"),
    ("super", [], "default"),
    ("super", ["2048", "4096", "32768"], "custom"),
    ("ultra", [], "default"),
    ("ultra", ["1024", "4096", "16384"], "custom"),
    ("ultra_batch", [], "default"),             # batch API, ultra.rs:52-80
    ("ultra_batch", ["1024", "4096", "16384"], "custom"),
    ("super_records", [], "default"),           # record-map reuse, supercdc.rs:49-59
    ("super_records", ["2048", "4096", "32768"], "custom"),
    ("leap", [], "default"),
]

golden = {}
for name in fixtures:
    path = FIX / f"{name}.bin"
    for algo, extra, suffix in CASES:
        if algo == "rabin_zero" and name != "const3_300k":
            continue  # unit-test replica only
        key = f"{name}/{algo}/{suffix}"
        out = subprocess.run([str(GEN), str(path), algo, *extra],
                             capture_output=True, text=True)
        if out.returncode != 0:
            print("SKIP(panic)", key, out.stderr.strip().splitlines()[-1:])
            continue
        chunks = [[int(a), int(b)] for a, b in (l.split() for l in out.stdout.splitlines())]
        golden[key] = chunks

(GOLD / "golden.json").write_text(json.dumps(golden))
print("cases:", len(golden), "->", GOLD / "golden.json")
# quick sanity peek
for k in ["rand_1m/ae/default", "rand_1m/rabin/default", "rand_1m/super/default",
          "rand_1m/ultra/default", "rand_1m/leap/default", "rand_1m/seq/inc",
          "rand_0b/leap/default", "const1_1m/ultra/default"]:
    v = golden.get(k)
    print(k, "n=", len(v) if v is not None else None, "first3=", v[:3] if v else v, "last=", v[-1] if v else None)
