from dmshadoop_spark.similarity.knn import brute_force_knn, lsh_knn

__all__ = ["brute_force_knn", "lsh_knn"]
