"""Additional TPC-H-shaped queries (SURVEY.md §7 step 5 — the operators the
oracle can check hardest). Q6 showcases pure scan+pushdown; Q10 the
revenue-per-customer join with returned-item filter.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dmshadoop_spark.catalog import load_table
from dmshadoop_spark.functions.numeric import dec2, dec4, money
from dmshadoop_spark.registry import query


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: every predicate reaches the parquet scan (shipdate
    range via row-group stats, discount/quantity via filters) — zero
    shuffle besides the single-row final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    ts = li.schema["l_shipdate"].dataType
    cond = (
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast(ts))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast(ts))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.filter(cond).agg(
        money(F.sum(dec2("l_extendedprice") * dec4("l_discount"))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer. The returnflag
    filter prunes the fact scan before the join; nation broadcasts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    revenue = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    return joined.groupBy("c_custkey", "c_name", "n_name").agg(
        money(F.sum(revenue)).alias("revenue")
    )


@query(
    "t4b_index_search",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    postings AS (
        SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id
    ),
    dfreq AS (
        SELECT term, count(*) AS doc_freq FROM postings GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT p.doc_id,
           CAST(ROUND(SUM(p.tf * ln(CAST(n.n_docs AS DOUBLE)
                                    / CAST(d.doc_freq AS DOUBLE))), 4)
                AS DOUBLE) AS score
    FROM postings p JOIN dfreq d USING (term) CROSS JOIN n
    WHERE p.term IN ('scan', 'merge')
    GROUP BY p.doc_id
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def t4b_index_search(spark, sf_dir):
    """Search answered FROM the materialized inverted index (search/index.py)
    — the library path, vs t4's inline pipeline."""
    from dmshadoop_spark.search import build_inverted_index, tfidf_search

    docs = load_table(spark, sf_dir, "documents")
    index = build_inverted_index(docs)
    return tfidf_search(index, n_docs=docs.count(), query="scan merge", k=10)
