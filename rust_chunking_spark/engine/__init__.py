from .lake import (AppendOnlyTable, BucketedLake, ChunkStore,  # noqa: F401
                   MorBucketedLake)
from .ingest import CdcIngestJob, IngestMetrics  # noqa: F401
