from dmshadoop_spark.similarity.jl import auto_expand, jl_project, jl_sq8_knn
from dmshadoop_spark.similarity.kmeans import kmeans_centroids
from dmshadoop_spark.similarity.knn import brute_force_knn, ivf_knn, lsh_knn
from dmshadoop_spark.similarity.pq import (
    ivfpq_knn,
    pq_encode,
    pq_knn,
    train_pq_codebooks,
)

__all__ = [
    "brute_force_knn",
    "ivf_knn",
    "auto_expand",
    "jl_project",
    "jl_sq8_knn",
    "kmeans_centroids",
    "ivfpq_knn",
    "lsh_knn",
    "pq_encode",
    "pq_knn",
    "train_pq_codebooks",
]
