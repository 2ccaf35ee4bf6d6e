from dmshadoop_spark.search.index import build_inverted_index, tfidf_search

__all__ = ["build_inverted_index", "tfidf_search"]
