"""Full-text search library (SURVEY.md §2.9) — the finished form of the
reference's unfinished Solr delegation (src/DMS.py:345-356, README.md:24
"Search (Working on)").

``build_inverted_index`` materializes the derived index table once per
corpus snapshot (tokenize → explode → partial-count → shuffle on term);
``tfidf_search`` answers queries from it with a broadcast join — the
per-query cost is proportional to the posting lists touched, not the
corpus. This is the library behind queries t2-t5; DocumentStore.search
uses the direct-scan form for small stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dmshadoop_spark.functions.text import tokenize


def build_inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf) postings plus per-term doc_freq.

    Persist the result as a Parquet table partitioned/sorted by term for
    production use; rebuilding is one batch job (freshness = snapshot
    cadence, SURVEY §4.2).
    """
    from pyspark.sql import Window

    tokens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokenize(F.col(text_col))).alias("term"),
    ).filter(F.col("term").isNotNull())
    postings = tokens.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # doc_freq as a window over the postings aggregate, NOT a second
    # aggregate branch joined back: the join form duplicates the whole
    # scan→explode→agg subtree because the inferred isnotnull(term) breaks
    # exchange-reuse canonical equality (SCALE.md finding #5). This form
    # is one scan, one agg exchange, one term-hash window exchange.
    return postings.withColumn(
        "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )


def tfidf_search(
    index: DataFrame,
    n_docs: int | DataFrame,
    query: str,
    k: int = 10,
) -> DataFrame:
    """Top-k (doc_id, score) for a whitespace query, TF-IDF scored.

    ``n_docs`` is either a plain int or a 1-row DataFrame with an
    ``n_docs`` column (e.g. ``docs.agg(count(*))``): the DataFrame form
    folds the corpus count into the plan as a broadcast cross join — one
    job, no driver-side action — and on parquet that count branch is
    metadata-only (reads zero data columns).

    Deterministic: score rounded to 4 decimals before ranking, ties broken
    on doc_id — the same contract as query t4.
    """
    terms = [t for t in query.lower().split() if t]
    if not terms:
        return index.select("doc_id").limit(0).withColumn(
            "score", F.lit(0.0)
        )
    matched = index.filter(F.col("term").isin(*terms))
    if isinstance(n_docs, DataFrame):
        matched = matched.crossJoin(broadcast(n_docs))
        n_expr = F.col("n_docs").cast("double")
    else:
        n_expr = F.lit(float(n_docs))
    idf = F.log(n_expr / F.col("doc_freq").cast("double"))
    scored = matched.groupBy("doc_id").agg(
        F.round(F.sum(F.col("tf") * idf), 4).cast("double").alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
