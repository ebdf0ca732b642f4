from .inspect import explain_str, assert_broadcast_join, assert_reads_columns  # noqa: F401
