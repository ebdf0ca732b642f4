from .stream_ingest import start_stream_ingest  # noqa: F401
