from .knn import brute_force_topk, lsh_ann_topk, near_dup_embeddings

__all__ = ["brute_force_topk", "lsh_ann_topk", "near_dup_embeddings"]
