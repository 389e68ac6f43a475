from .dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    token_jaccard_pairs,
)
from .similarity import (
    cosine_knn_bruteforce,
    cosine_knn_ivf,
    cosine_knn_lsh,
    embedding_near_dup_pairs,
)
from .skew import salted_aggregate

__all__ = [
    "exact_dedup",
    "token_jaccard_pairs",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_near_dup_pairs",
    "cosine_knn_bruteforce",
    "cosine_knn_lsh",
    "cosine_knn_ivf",
    "embedding_near_dup_pairs",
    "salted_aggregate",
]
