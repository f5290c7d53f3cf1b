from .clusters import keep_one_per_cluster, resolve_clusters
from .exact import exact_dedup, fingerprint_dedup
from .incremental import (
    build_dedup_state,
    incremental_dedup,
    read_dedup_state,
    updated_state,
    write_dedup_state,
)
from .jaccard import ngram_jaccard_pairs
from .minhash import minhash_candidate_pairs, minhash_near_dup_pairs, minhash_signature
from .simhash import simhash_column, simhash_near_dup_pairs

__all__ = [
    "exact_dedup",
    "fingerprint_dedup",
    "build_dedup_state",
    "incremental_dedup",
    "read_dedup_state",
    "updated_state",
    "write_dedup_state",
    "ngram_jaccard_pairs",
    "minhash_signature",
    "minhash_candidate_pairs",
    "minhash_near_dup_pairs",
    "simhash_column",
    "simhash_near_dup_pairs",
    "resolve_clusters",
    "keep_one_per_cluster",
]
