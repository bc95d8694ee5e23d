from .dedup import exact_dedup_groups, minhash_lsh_pairs, simhash_fingerprints
from .similarity import brute_force_knn
from .topk import top_k_per_group

__all__ = [
    "exact_dedup_groups",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "brute_force_knn",
    "top_k_per_group",
]
