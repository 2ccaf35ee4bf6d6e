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
    filter prunes the fact scan before the join; nation broadcasts,
    customer joins unhinted (it scales with SF)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    # customer scales with SF: unhinted (AQE decides); nation is fixed-size.
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
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


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS as a left-semi join with a correlated
    non-equi conjunct. Spark keeps only o_orderkey/o_orderdate on the
    probe side and builds the lineitem key set — no payload duplication,
    one shuffle on orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    shipped_late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return shipped_late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(ROUND(
               100.00 * SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END)
               / SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregate over a fact⋈dim join. The
    CASE runs map-side inside the partial aggregate; the final exchange
    carries two decimal sums. Decimal division keeps the ratio exact
    until one terminal round."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        money(
            F.lit(100.00)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct")
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered IN-subquery as a pre-aggregated
    semi join. The quantity rollup happens BEFORE joining customer/orders
    (the aggregate shrinks lineitem by ~4×; joining first would shuffle
    the fat side twice). Top-100 via TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    joined = (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    return (
        joined.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q19_disjunctive_filter",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_filter(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive mixed-table predicates. Catalyst
    factors the single-table conjuncts out of the OR (l_quantity range
    and p_size/p_brand ranges reach their scans as pushed filters); the
    residual OR evaluates post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    b = F.col("p_brand")
    s = F.col("p_size")
    q = F.col("l_quantity")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#13") & s.between(10, 30) & q.between(10, 30))
        | ((b == "Brand#20") & s.between(20, 50) & q.between(20, 40))
    )
    rev = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    return j.filter(cond).agg(
        money(F.sum(rev)).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
