from .lake import BucketedLake, MorBucketedLake  # noqa: F401
from .ingest import CdcIngestJob, IngestMetrics  # noqa: F401
