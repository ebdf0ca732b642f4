from .chunking import (  # noqa: F401
    CHUNK_SCHEMA,
    chunk_udf,
    fingerprint_udf,
    make_chunker,
    sha3_256_udf,
)
