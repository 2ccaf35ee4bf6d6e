from dmshadoop_spark.similarity.kmeans import kmeans_centroids
from dmshadoop_spark.similarity.knn import brute_force_knn, ivf_knn, lsh_knn

__all__ = ["brute_force_knn", "ivf_knn", "kmeans_centroids", "lsh_knn"]
