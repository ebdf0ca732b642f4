from .wal import WalSource  # noqa: F401
