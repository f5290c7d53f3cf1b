from .ivf import ivf_ann_topk, train_centroids
from .pca import fit_pca, project_pca
from .knn import brute_force_topk, lsh_ann_topk, near_dup_embeddings

__all__ = [
    "brute_force_topk",
    "lsh_ann_topk",
    "near_dup_embeddings",
    "ivf_ann_topk",
    "train_centroids",
    "fit_pca",
    "project_pca",
]
