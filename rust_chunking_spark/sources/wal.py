"""WAL / binlog source abstraction.

The simulated binlog is a directory of epoch-numbered parquet segments
(`epoch=NNNNNN/`). On a real deployment this class is swapped for a Kafka /
Debezium reader; the engine only depends on `epochs()` + `read_epoch()`
(batch) or a `readStream` handle (streaming, see streaming/stream_ingest.py).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


class WalSource:
    SEG_RE = re.compile(r"^epoch=(\d{6})$")

    def __init__(self, path: str):
        self.path = path

    def epochs(self) -> list[int]:
        out = []
        for entry in sorted(os.listdir(self.path)):
            m = self.SEG_RE.match(entry)
            if m:
                out.append(int(m.group(1)))
        return out

    def segment_path(self, epoch: int) -> str:
        return os.path.join(self.path, f"epoch={epoch:06d}")

    def read_epoch(self, spark: SparkSession, epoch: int) -> DataFrame:
        return spark.read.parquet(self.segment_path(epoch))

    def read_all(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(
            *[self.segment_path(e) for e in self.epochs()])
