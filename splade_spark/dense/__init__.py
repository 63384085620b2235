from splade_spark.dense.hash_embed import (
    cosine_topk_sparse, hash_embed_docs, hash_embed_queries,
)
from splade_spark.dense.ann import (
    brute_cosine_topk,
    embedding_near_dup_pairs,
    ivf_assign,
    ivf_cosine_topk,
    ivf_refine_centroids,
    lsh_cosine_topk,
    lsh_near_dup_pairs,
)

__all__ = [
    "hash_embed_docs",
    "hash_embed_queries",
    "cosine_topk_sparse",
    "brute_cosine_topk",
    "ivf_assign",
    "ivf_cosine_topk",
    "ivf_refine_centroids",
    "lsh_cosine_topk",
    "embedding_near_dup_pairs",
    "lsh_near_dup_pairs",
]
