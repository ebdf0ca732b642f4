from .lake import BucketedLake  # noqa: F401
from .ingest import CdcIngestJob, IngestMetrics  # noqa: F401
