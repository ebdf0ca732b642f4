from .dedup_stream import StreamingDedup  # noqa: F401
from .monitors import (url_change_tracker,  # noqa: F401
                       windowed_event_counts)
from .stream_ingest import (drain_open_epochs,  # noqa: F401
                            start_stream_ingest)
