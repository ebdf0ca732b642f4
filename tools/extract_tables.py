"""Extract frozen LUT constants from the reference Rust source into a Python module.

These tables are *data*, not code: GEAR/GEAR_LS originate from the public
fastcdc-rs project (see /root/reference/src/supercdc.rs:190), BYTE_DISTANCES from
ultra.rs:200-209, EF_MATRIX from leap_based.rs:130-387 (a frozen random matrix the
reference commits as its spec). Byte-identical tables are required for
boundary-identical chunking, which is the correctness bar (BASELINE.json north_star).
"""
import re, pathlib

REF = pathlib.Path("/root/reference/src")
OUT = pathlib.Path("/root/repo/rust_chunking_spark/kernels/_tables.py")

def ints_in(block: str):
    return [int(x, 0) for x in re.findall(r"0x[0-9a-fA-F_]+|\b\d[\d_]*\b", block.replace("_", ""))]

def extract_const(path, name):
    src = (REF / path).read_text()
    m = re.search(rf"const {name}:[^=]+=\s*\[(.*?)\n\];", src, re.S)
    assert m, name
    return ints_in(m.group(1))

gear = extract_const("supercdc.rs", "GEAR")
gear_ls = extract_const("supercdc.rs", "GEAR_LS")
byte_dist = extract_const("ultra.rs", "BYTE_DISTANCES")
assert len(gear) == 256 and len(gear_ls) == 256 and len(byte_dist) == 256
# sanity: GEAR_LS is GEAR shifted left one bit (mod 2^64)
assert all(((g << 1) & 0xFFFFFFFFFFFFFFFF) == gls for g, gls in zip(gear, gear_ls))

# EF_MATRIX: [[u8;5];256]
src = (REF / "leap_based.rs").read_text()
m = re.search(r"const EF_MATRIX: \[\[u8; 5\]; 256\] = \[(.*?)\n\];", src, re.S)
assert m
rows = re.findall(r"\[([^\]]+)\]", m.group(1))
ef = [[int(x) for x in row.split(",")] for row in rows]
assert len(ef) == 256 and all(len(r) == 5 for r in ef)

def fmt_list(xs, hex_=True, per=4):
    out, line = [], []
    for x in xs:
        line.append(f"0x{x:016x}" if hex_ else str(x))
        if len(line) == per:
            out.append("    " + ", ".join(line) + ",")
            line = []
    if line:
        out.append("    " + ", ".join(line) + ",")
    return "\n".join(out)

with OUT.open("w") as f:
    f.write('"""Frozen LUT constants, extracted verbatim from the reference spec by tools/extract_tables.py.\n\n'
            "GEAR/GEAR_LS: /root/reference/src/supercdc.rs:192-326 (originally fastcdc-rs);\n"
            "BYTE_DISTANCES: /root/reference/src/ultra.rs:200-209;\n"
            "EF_MATRIX: /root/reference/src/leap_based.rs:130-387.\n"
            'Data tables, not code -- byte-identical values are the correctness spec.\n"""\n')
    f.write("import numpy as np\n\n")
    f.write("GEAR = np.array([\n%s\n], dtype=np.uint64)\n\n" % fmt_list(gear))
    f.write("GEAR_LS = np.array([\n%s\n], dtype=np.uint64)\n\n" % fmt_list(gear_ls))
    f.write("BYTE_DISTANCES = np.array([\n%s\n], dtype=np.int64)\n\n" % fmt_list(byte_dist, hex_=False, per=16))
    f.write("EF_MATRIX = np.array([\n")
    for r in ef:
        f.write("    [%s],\n" % ", ".join(map(str, r)))
    f.write("], dtype=np.uint8)\n")
print("wrote", OUT)
