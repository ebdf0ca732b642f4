import json
import pathlib
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

FIXTURE_DIR = ROOT / "tests" / "fixtures"
GOLDEN_PATH = ROOT / "tests" / "golden" / "golden.json"


@pytest.fixture(scope="session")
def golden():
    return json.loads(GOLDEN_PATH.read_text())


@pytest.fixture(scope="session")
def fixture_bytes():
    cache = {}

    def load(name: str) -> bytes:
        if name not in cache:
            cache[name] = (FIXTURE_DIR / f"{name}.bin").read_bytes()
        return cache[name]

    return load


@pytest.fixture(scope="session")
def spark():
    from rust_chunking_spark.session import get_spark

    s = get_spark(app_name="tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
