from dmshadoop_spark.search.index import (
    boolean_search,
    field_scoped_search,
    build_inverted_index,
    parse_query_string,
    phrase_search,
    positional_index,
    tfidf_search,
)

__all__ = [
    "boolean_search",
    "field_scoped_search",
    "build_inverted_index",
    "phrase_search",
    "parse_query_string",
    "positional_index",
    "tfidf_search",
]
