"""Aggregations — SURVEY.md §2.4 (A1-A9).

A1/A2 are the reference's own semantics (get_lastest_version src/DMS.py:385,
get_file_version :368) done numerically (bug note B1: the reference sorts
version *strings*, so v10 < v9 — we use numeric max). A5-A9 cover the
TPC-H-ish extension tier. All money aggregates run in exact DECIMAL so the
distributed partial/final aggregation is order-insensitive and hash-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmshadoop_spark.catalog import load_table
from dmshadoop_spark.functions.numeric import dec2, dec4, exact_avg, money
from dmshadoop_spark.registry import query


@query(
    "a1_max_per_group",
    oracle="""
    SELECT source, max(doc_id) AS latest_doc_id, count(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def a1_max_per_group(spark, sf_dir):
    """Latest-version-per-name (get_lastest_version, src/DMS.py:385-392) with
    numeric ordering (bug B1 fixed). Map-side partial max → tiny shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.max("doc_id").alias("latest_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "a2_collect_list",
    oracle="""
    SELECT source,
           array_to_string(list_sort(list(DISTINCT lang)), '|') AS langs
    FROM documents GROUP BY source
    """,
)
def a2_collect_list(spark, sf_dir):
    """Collect values per group (the per-file version list, src/DMS.py:377-383)
    — sorted for determinism, mirroring the reference's own sort-before-use
    at src/DMS.py:391. Serialized to a '|'-joined scalar: the driver's
    canonicalizer hashes cell values and cannot factorize list cells
    (round-1 FAIL: 'unhashable type: list'), and the join loses nothing
    because lang values never contain '|'."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.array_join(F.array_sort(F.collect_set("lang")), "|").alias("langs")
    )


@query(
    "a3_count",
    oracle="SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
)
def a3_count(spark, sf_dir):
    """Result-set counting (the numFound check, src/DMS.py:352)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


@query("a4_distinct", oracle="SELECT DISTINCT source FROM documents")
def a4_distinct(spark, sf_dir):
    """Distinct names (implied by delete_all's per-file loop, src/DMS.py:412)."""
    return load_table(spark, sf_dir, "documents").select("source").distinct()


@query(
    "a5_numeric_rollups",
    oracle="""
    SELECT c_nationkey,
           count(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS sum_acctbal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_acctbal,
           min(c_acctbal) AS min_acctbal,
           max(c_acctbal) AS max_acctbal
    FROM customer GROUP BY c_nationkey
    """,
)
def a5_numeric_rollups(spark, sf_dir):
    """sum/avg/min/max rollups. avg = exact decimal sum / count with one
    IEEE division — bit-identical across engines and row orders."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        money(F.sum(dec2("c_acctbal"))).alias("sum_acctbal"),
        exact_avg("c_acctbal").alias("avg_acctbal"),
        F.min("c_acctbal").alias("min_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
    )


@query(
    "a6_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))
                          * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a6_q1_pricing_summary(spark, sf_dir):
    """Multi-key hash aggregate — the flagship TPC-H-Q1-shaped pricing
    summary. HashAggregateExec does partial→shuffle→final automatically; the
    shuffle carries only (2 keys × ~4 groups) of decimal partials."""
    from dmshadoop_spark.catalog import widen

    # widen(): the single-row-group test file gives the scan ONE split,
    # so the six decimal partial sums over 600k rows ran on one core;
    # the round-robin exchange costs less than the serial aggregation
    # (measured 1.49 → 1.06 s at sf0.1) and is a no-op at scale
    # (catalog.widen docstring). Decimal sums are order-free — values
    # identical on any partitioning.
    li = widen(load_table(spark, sf_dir, "lineitem"))
    cutoff = F.lit("2000-09-02 00:00:00").cast(li.schema["l_shipdate"].dataType)
    disc = F.lit(1) - dec4("l_discount")
    charge = dec2("l_extendedprice") * disc * (F.lit(1) + dec4("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            money(F.sum(dec2("l_extendedprice") * disc)).alias("sum_disc_price"),
            money(F.sum(charge)).alias("sum_charge"),
            (
                F.sum(dec2("l_quantity")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_qty"),
            (
                F.sum(dec4("l_discount")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "a7_count_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def a7_count_distinct(spark, sf_dir):
    """Exact distinct count (expands to a two-phase aggregate in Spark)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


@query("a7_approx_count_distinct")  # approximate → rows-only check
def a7_approx_count_distinct(spark, sf_dir):
    """HLL++ approximate distinct — the scale path (no shuffle of the
    distinct values, constant memory). No SQL oracle: approximation is
    engine-specific; the driver records a rows-only check."""
    from dmshadoop_spark.functions.digest import with_sorted_digest

    ev = load_table(spark, sf_dir, "events")
    est = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx")
    )
    # HLL++ is deterministic for fixed data: digest pins the estimates.
    return with_sorted_digest(est, "event_type", "n_users_approx")


@query(
    "a8_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS cnt
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def a8_rollup(spark, sf_dir):
    """Hierarchical rollup (region → nation → grand total)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "a9_map_key_count",
    oracle="""
    SELECT k AS meta_key, count(*) AS cnt
    FROM (SELECT unnest(json_keys(props)) AS k FROM events)
    GROUP BY k
    """,
)
def a9_map_key_count(spark, sf_dir):
    """Aggregate over dynamic map-typed metadata — the reference's schemaless
    meta_data family (src/DMS.py:135-155) as explode(map_keys) → count."""
    ev = load_table(spark, sf_dir, "events")
    meta = F.from_json("props", "map<string,string>")
    return (
        # explode_outer: an inner explode makes InferFiltersFromGenerate
        # push size(map_keys(from_json(props)))>0 to the scan — parsing
        # every props JSON twice per row.
        ev.select(F.explode_outer(F.map_keys(meta)).alias("meta_key"))
        .filter(F.col("meta_key").isNotNull())
        .groupBy("meta_key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query("a7b_hll_sketch_union")  # sketch estimates are engine-specific → rows-only
def a7b_hll_sketch_union(spark, sf_dir):
    """Mergeable distinct-count sketches (Apache DataSketches HLL, built into
    Spark). Distinct counts don't re-aggregate — sum(per-month distincts)
    overcounts — so the scale pattern is: keep a PARTIAL SKETCH per coarse
    bucket (month), then union sketches for any coarser rollup without
    touching raw data again. At 100 TB the monthly sketch table is KBs and
    answers every what's-the-distinct-over-window question that would
    otherwise rescan the fact table. Union-vs-global equivalence and error
    vs exact are pinned in tests/test_operators.py."""
    from dmshadoop_spark.functions.digest import with_sorted_digest

    ev = load_table(spark, sf_dir, "events")
    monthly = ev.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.hll_sketch_agg("user_id", 12).alias("sk")
    )
    est = monthly.agg(
        F.count(F.lit(1)).alias("n_partials"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_users_est"),
    )
    return with_sorted_digest(est, "n_partials", "distinct_users_est")


@query(
    "a10_percentile",
    oracle="""
    SELECT c_mktsegment,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal) AS median_bal,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal) AS p90_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def a10_percentile(spark, sf_dir):
    """Exact discrete percentiles per group. percentile_disc picks an actual
    data value (no interpolation arithmetic), so Spark and DuckDB agree
    bit-for-bit on doubles. Exact percentile state is O(distinct values per
    group) — fine for bounded groups; the unbounded-cardinality scale path
    is a10b_approx_percentile."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)").alias(
            "median_bal"
        ),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal)").alias(
            "p90_bal"
        ),
    )


@query("a10b_approx_percentile")  # approximation is engine-specific → rows-only
def a10b_approx_percentile(spark, sf_dir):
    """KLL/GK-style approximate percentiles — constant memory per group
    regardless of value cardinality; the 100 TB default when groups are
    unbounded (accuracy parameter trades memory for rank error)."""
    from dmshadoop_spark.functions.digest import with_sorted_digest

    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.array(F.lit(0.5), F.lit(0.99)), 10000)
        .cast("array<double>")
        .cast("string")  # stringified: the gate cannot hash array cells
        .alias("price_quantiles")
    )
    return with_sorted_digest(q, "l_returnflag", "price_quantiles")


@query(
    "a11_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           count(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS bucket_total
    FROM orders GROUP BY 1
    """,
)
def a11_histogram(spark, sf_dir):
    """Fixed-width histogram — one partial-aggregated scan; the bucket
    expression (one shared IEEE division + floor) is the group key, so the
    exchange carries at most n_buckets rows per map partition."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(50000.0)).alias("bucket")
    return orders.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money(F.sum(dec2("o_totalprice"))).alias("bucket_total"),
    )


@query(
    "a8b_grouping_sets",
    oracle="""
    SELECT r_name, n_name,
           CAST(grouping(r_name) + 2 * grouping(n_name) AS BIGINT) AS gid,
           count(*) AS cnt
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
    """,
)
def a8b_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form rollup/cube specialize) with
    a grouping-id disambiguator so real NULL keys and subtotal rows can't
    collide. One Expand + one partial-aggregated shuffle, rows multiplied
    only by the number of sets."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    joined.createOrReplaceTempView("__a8b_joined")
    return spark.sql(
        """
        SELECT r_name, n_name,
               CAST(grouping(r_name) + 2 * grouping(n_name) AS BIGINT) AS gid,
               count(*) AS cnt
        FROM __a8b_joined
        GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
        """
    )


@query(
    "a12_table_profile",
    oracle="""
    SELECT 'o_custkey' AS col, count(*) AS n_rows,
           count(*) - count(o_custkey) AS n_nulls,
           count(DISTINCT o_custkey) AS n_distinct,
           CAST(min(o_custkey) AS VARCHAR) AS min_val,
           CAST(max(o_custkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           CAST(min(o_orderpriority) AS VARCHAR),
           CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(min(o_totalprice) AS VARCHAR),
           CAST(max(o_totalprice) AS VARCHAR)
    FROM orders
    """,
)
def a12_table_profile(spark, sf_dir):
    """Column profiling (the ANALYZE TABLE statistics pass): null count,
    exact distinct, min/max per column, ONE scan. Spark plans the mixed
    distinct aggregates with an Expand (rows × n_distinct_aggs) feeding
    one partial+final aggregation — at 100 TB swap exact distinct for
    approx_count_distinct (a7) and the Expand disappears. min/max
    stringified so one long-format schema fits every column type."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderpriority", "o_totalprice"]
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(c).alias(f"c_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"d_{c}") for c in cols],
        *[F.min(c).cast("string").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("string").alias(f"mx_{c}") for c in cols],
    )
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"c_{c}")).alias("n_nulls"),
            F.col(f"d_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_val"),
            F.col(f"mx_{c}").alias("max_val"),
        )
        for c in cols
    ]
    return agg.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


@query(
    "a13_constraint_audit",
    oracle="""
    SELECT 'lineitem_quantity_null' AS rule,
           CAST(count(*) - count(l_quantity) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_quantity_range',
           CAST(coalesce(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                                  THEN 1 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(coalesce(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                                  THEN 1 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders_duplicate_pk',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_status_domain',
           CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                                  THEN 1 END), 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_fk_customer',
           CAST(count(*) AS BIGINT)
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST(count(*) AS BIGINT)
    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    """,
)
def a13_constraint_audit(spark, sf_dir):
    """Data-quality constraint audit — the deequ/Delta-constraints shape:
    declared expectations (non-null, value range, enum domain, primary-key
    uniqueness, referential integrity) verified in one pass per table,
    long-format (rule, n_violations) output.

    Plan economics: lineitem — the 100 TB table — is scanned ONCE: the
    row-level rules (null / range / domain) and the referential probe
    share a single pass, with the FK flag computed by a left join against
    the pruned o_orderkey key set (one shuffle per side on the uniform
    key — exactly what a LEFT ANTI would cost — but no second scan, and
    the key side carries one column). orders likewise: one scan feeds
    pk-uniqueness (count(*) − count(DISTINCT) inside the same aggregate —
    no extra groupBy pass), the enum-domain rule, and the FK probe into
    customer (key set small enough for AQE to broadcast). Output is seven
    (rule, n_violations) rows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    zero = F.lit(0)
    cnt_if = lambda c: F.coalesce(F.sum(F.when(c, 1)), zero).cast("long")  # noqa: E731

    li_flags = li.select("l_quantity", "l_discount", "l_orderkey").join(
        orders.select(F.col("o_orderkey").alias("__ok")),
        F.col("l_orderkey") == F.col("__ok"),
        "left",
    )
    li_agg = li_flags.agg(
        (F.count(F.lit(1)) - F.count("l_quantity")).alias("q_null"),
        cnt_if((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias("q_range"),
        cnt_if((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias("d_range"),
        cnt_if(F.col("__ok").isNull()).alias("fk_ord"),
    )
    li_rules = li_agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(rule).alias("rule"),
                        F.col(c).alias("n_violations"),
                    )
                    for rule, c in [
                        ("lineitem_quantity_null", "q_null"),
                        ("lineitem_quantity_range", "q_range"),
                        ("lineitem_discount_range", "d_range"),
                        ("lineitem_fk_orders", "fk_ord"),
                    ]
                ]
            )
        ).alias("r")
    ).select("r.*")

    ord_flags = orders.select("o_orderkey", "o_custkey", "o_orderstatus").join(
        cust.select(F.col("c_custkey").alias("__ck")),
        F.col("o_custkey") == F.col("__ck"),
        "left",
    )
    ord_agg = ord_flags.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_dup"),
        cnt_if(~F.col("o_orderstatus").isin("O", "F", "P")).alias("dom"),
        cnt_if(F.col("__ck").isNull()).alias("fk_cust"),
    )
    ord_rules = ord_agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(rule).alias("rule"),
                        F.col(c).alias("n_violations"),
                    )
                    for rule, c in [
                        ("orders_duplicate_pk", "pk_dup"),
                        ("orders_status_domain", "dom"),
                        ("orders_fk_customer", "fk_cust"),
                    ]
                ]
            )
        ).alias("r")
    ).select("r.*")
    return li_rules.unionByName(ord_rules)


@query(
    "a14_heavy_hitters",
    oracle="""
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
    SELECT user_id, cnt FROM c
    WHERE cnt * 10000 > (SELECT CAST(sum(cnt) AS BIGINT) FROM c) * 75
    """,
)
def a14_heavy_hitters(spark, sf_dir):
    """Exact heavy hitters (frequency > 0.75% of the stream) via two-level
    aggregation: the per-key count is one map-side-combined shuffle on a
    uniform key, and the global total comes from an unbounded window over
    the ALREADY-AGGREGATED table — |keys| rows, not |events| — so no second
    scan of the fact table and no driver-side action. The 100 TB shape: the
    micro-table of per-key counts is what flows into the threshold test,
    exactly the micro-aggregate-first pattern of x11/x12."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    return (
        counts.withColumn("__total", total)
        .filter(F.col("cnt") * 10000 > F.col("__total") * 75)
        .select("user_id", "cnt")
    )


@query(
    "a15_mode_per_group",
    oracle="""
    SELECT user_id, event_type AS modal_type, cnt FROM (
        SELECT user_id, event_type, count(*) AS cnt,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type) AS rn
        FROM events GROUP BY user_id, event_type)
    WHERE rn = 1
    """,
)
def a15_mode_per_group(spark, sf_dir):
    """Mode (most frequent value) per group — aggregate to (group, value)
    counts first, then rank within group. The window runs over the compact
    aggregate (≤ |groups|·|domain| rows), never the raw events, and the
    event_type tie-break makes the answer unique under any parallelism.
    Same-key shuffle for the groupBy and the window → AQE coalesces them
    into one exchange."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("cnt"), F.col("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", F.col("event_type").alias("modal_type"), "cnt"
        )
    )


@query(
    "a16_stat_moments",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               count(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
               SUM(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(round(
               (CAST(sxx AS DOUBLE) - CAST(sx*sx AS DOUBLE)/n) / (n-1), 6)
               AS DOUBLE) AS var_qty,
           CAST(round(
               (CAST(sxy AS DOUBLE) - CAST(sx*sy AS DOUBLE)/n) / (n-1), 6)
               AS DOUBLE) AS covar_qty_price
    FROM m
    """,
)
def a16_stat_moments(spark, sf_dir):
    """Statistical aggregates (variance, covariance) WITHOUT the float-
    summation nondeterminism that makes built-in stddev/corr ungateable:
    Spark's var_samp/covar_samp stream Welford-style float updates whose
    low bits depend on partition merge order — at 1000 executors two runs
    of the same query disagree. Instead the raw moments (n, Σx, Σx²,
    Σxy) accumulate in DECIMAL — exact, order-free — and the variance/
    covariance formula is applied once at the end on identical operands,
    so every engine and every shuffle order produces the same bits.
    The moments are also mergeable (algebraic ⊕), which is what lets
    s17-style incremental rollups maintain them at O(delta)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = dec2("l_quantity")
    price = dec2("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qty).alias("sx"),
        F.sum(qty * qty).alias("sxx"),
        F.sum(price).alias("sy"),
        F.sum(qty * price).alias("sxy"),
    )
    n = F.col("n")
    var = F.round(
        (F.col("sxx").cast("double") - (F.col("sx") * F.col("sx")).cast("double") / n)
        / (n - 1),
        6,
    )
    cov = F.round(
        (F.col("sxy").cast("double") - (F.col("sx") * F.col("sy")).cast("double") / n)
        / (n - 1),
        6,
    )
    return m.select(
        "l_returnflag",
        "n",
        var.cast("double").alias("var_qty"),
        cov.cast("double").alias("covar_qty_price"),
    )


@query(
    "a17_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n,
           CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS min_price,
           CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a17_salted_agg(spark, sf_dir):
    """Skew-mitigated aggregation (operators/skew.py:salted_agg) as a
    driver-checkable query: lineitem grouped by l_returnflag — THREE
    groups over the whole fact table, exactly the hot-key shape where a
    single-level hash aggregate funnels each group through one task and
    AQE cannot help (it only splits JOIN partitions). The two-level form
    (partial over (key, salt), final over key) must hash-match the plain
    GROUP BY oracle — the salt changes the plan, never the algebra
    (sum→sum, count→sum, min→min, max→max re-aggregation laws).
    tests/test_plans.py pins that level 1 actually keys on the salt."""
    from dmshadoop_spark.operators import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        ["l_returnflag"],
        partial_aggs=[
            F.sum(dec2("l_quantity")).alias("_sq"),
            F.count(F.lit(1)).alias("_n"),
            F.min(dec2("l_extendedprice")).alias("_mn"),
            F.max(dec2("l_extendedprice")).alias("_mx"),
        ],
        final_aggs=[
            F.sum("_sq").cast("double").alias("sum_qty"),
            F.sum("_n").alias("n"),
            F.min("_mn").cast("double").alias("min_price"),
            F.max("_mx").cast("double").alias("max_price"),
        ],
    )
