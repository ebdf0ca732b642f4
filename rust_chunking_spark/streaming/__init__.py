from .stream_ingest import (drain_open_epochs,  # noqa: F401
                            start_stream_ingest)
