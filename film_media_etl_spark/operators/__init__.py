from .dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_near_dup_pairs,
    token_jaccard_pairs,
)
from .similarity import cosine_knn_bruteforce, cosine_knn_lsh, embedding_near_dup_pairs

__all__ = [
    "exact_dedup",
    "token_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_near_dup_pairs",
    "cosine_knn_bruteforce",
    "cosine_knn_lsh",
    "embedding_near_dup_pairs",
]
