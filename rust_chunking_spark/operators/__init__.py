from .text_dedup import (  # noqa: F401
    connected_components,
    dedup_corpus,
    incremental_exact_dup_pairs,
    incremental_lsh_dup_pairs,
    lsh_duplicate_pairs,
    minhash_signature_udf,
    simhash64_udf,
)
from .similarity import brute_force_topk, hyperplane_lsh_buckets  # noqa: F401
