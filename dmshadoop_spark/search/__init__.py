from dmshadoop_spark.search.index import (
    boolean_search,
    build_inverted_index,
    phrase_search,
    positional_index,
    tfidf_search,
)

__all__ = [
    "boolean_search",
    "build_inverted_index",
    "phrase_search",
    "positional_index",
    "tfidf_search",
]
