"""The spark-submit --py-files artifact is complete and zipimport-safe."""

import os
import subprocess
import sys
import zipfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from package_pyfiles import build  # noqa: E402


def test_zip_contains_whole_package(tmp_path):
    zip_path, stub_path = build(str(tmp_path))
    names = zipfile.ZipFile(zip_path).namelist()
    for mod in [
        "rust_chunking_spark/__init__.py",
        "rust_chunking_spark/engine/ingest.py",
        "rust_chunking_spark/engine/lake.py",
        "rust_chunking_spark/kernels/vectorized.py",
        "rust_chunking_spark/kernels/_tables.py",
        "rust_chunking_spark/streaming/stream_ingest.py",
        "rust_chunking_spark/streaming/monitors.py",
        "rust_chunking_spark/operators/text_dedup.py",
        "rust_chunking_spark/functions/chunking.py",
        "rust_chunking_spark/ingest_cli.py",
    ]:
        assert mod in names, mod
    assert os.path.exists(stub_path)


def test_kernels_import_and_run_from_zip_only(tmp_path):
    """Clean subprocess with ONLY the zip on sys.path for the package
    (zipimport, no extraction) — the deployment path executors take."""
    zip_path, _ = build(str(tmp_path))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import rust_chunking_spark\n"
        "assert rust_chunking_spark.__file__.startswith(%r)\n"
        "from rust_chunking_spark.kernels.vectorized import ALGORITHMS\n"
        "import numpy as np\n"
        "buf = np.arange(200000, dtype=np.uint8).tobytes()\n"
        "chunks = ALGORITHMS['super'](buf)\n"
        "assert int(chunks[:, 1].sum()) == len(buf)\n"
        "print('zip-import OK', len(chunks))\n" % (zip_path, zip_path))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=str(tmp_path), timeout=120)
    assert r.returncode == 0, r.stderr
    assert "zip-import OK" in r.stdout
