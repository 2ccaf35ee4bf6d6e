"""Joins — SURVEY.md §2.3 (J1-J8).

The reference never joins two tables, but three of its operations are joins
in disguise (existence probe src/DMS.py:114, delete-by-key loops :400-418,
row↔blob pairing by shared key :102-103). J4-J8 complete the taxonomy for
the star-schema testdata and the 100 TB design point: small dims broadcast,
big joins shuffle on their keys, the as-of join avoids candidate blow-up.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dmshadoop_spark.catalog import load_table
from dmshadoop_spark.functions.numeric import dec2, dec4, money
from dmshadoop_spark.operators.asof import asof_join
from dmshadoop_spark.operators.rangejoin import binned_range_join
from dmshadoop_spark.operators.skew import salted_join
from dmshadoop_spark.registry import query


@query(
    "j1_semi_join",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE EXISTS (SELECT 1 FROM customer
                  WHERE c_custkey = o_custkey AND c_acctbal > 5000)
    """,
)
def j1_semi_join(spark, sf_dir):
    """Left-semi join — the upload existence probe (src/DMS.py:114) done as
    one set-oriented pass instead of a per-row fetch loop."""
    orders = load_table(spark, sf_dir, "orders")
    # customer scales with SF — no broadcast hint; the semi join builds
    # only the key set and AQE picks broadcast when the filtered side is
    # actually small at runtime.
    rich = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return orders.join(
        rich, orders.o_custkey == rich.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey")


@query(
    "j2_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j2_anti_join(spark, sf_dir):
    """Left-anti join — delete-by-key set semantics (delete_all_version loop,
    src/DMS.py:400-402)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "j3_inner_join",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_mktsegment
    """,
)
def j3_inner_join(spark, sf_dir):
    """Equi inner join chain (TPC-H Q3 shape) — the implicit row↔blob pairing
    by shared key (src/DMS.py:102-103) generalized. lineitem⋈orders shuffles
    on the shared orderkey; customer is small relative to facts and AQE picks
    broadcast when it fits. At test SF both dims broadcast, leaving the whole
    probe+partial-agg pipeline on the fact scan's partitions — one for a
    single-row-group file — so the fact side widens to cluster width first
    (a no-op on any multi-split table; measured 1.47s→1.0s at sf0.1)."""
    from dmshadoop_spark.catalog import widen

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = widen(load_table(spark, sf_dir, "lineitem"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    revenue = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_items"),
        money(F.sum(revenue)).alias("revenue"),
    )


@query(
    "j4_broadcast_join",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def j4_broadcast_join(spark, sf_dir):
    """Broadcast hash join — explicit broadcast of the tiny dims so the fact
    scan never shuffles (nation=25, region=5 rows at every scale factor)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        money(F.sum(dec2("c_acctbal"))).alias("total_acctbal"),
    )


@query(
    "j5_outer_join",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def j5_outer_join(spark, sf_dir):
    """Left outer join — customers kept at zero orders (count skips NULLs)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "j6_range_join",
    oracle="""
    SELECT b.label AS bracket,
           count(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_price
    FROM orders o
    JOIN (VALUES ('xs', 0, 100000), ('s', 100000, 200000),
                 ('m', 200000, 300000), ('l', 300000, 400000),
                 ('xl', 400000, 1000000000)) AS b(label, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.label
    """,
)
def j6_range_join(spark, sf_dir):
    """Theta/range join against a tiny bracket table — broadcast nested loop
    with 5 brackets; at scale the small side stays broadcast so cost is one
    scan of the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    brackets = spark.createDataFrame(
        [("xs", 0, 100000), ("s", 100000, 200000), ("m", 200000, 300000),
         ("l", 300000, 400000), ("xl", 400000, 1000000000)],
        "label string, lo long, hi long",
    )
    joined = orders.join(
        broadcast(brackets),
        (orders.o_totalprice >= brackets.lo) & (orders.o_totalprice < brackets.hi),
    )
    return joined.groupBy(F.col("label").alias("bracket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money(F.sum(dec2("o_totalprice"))).alias("total_price"),
    )


@query(
    "j6b_binned_range_join",
    oracle="""
    SELECT s_suppkey,
           count(*) AS n_close,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS sum_bal
    FROM supplier s JOIN customer c
      ON c.c_acctbal >= s.s_acctbal - 50 AND c.c_acctbal < s.s_acctbal + 50
    GROUP BY s_suppkey
    """,
)
def j6b_binned_range_join(spark, sf_dir):
    """Large×large range join — every customer within ±50 account balance of
    each supplier. BOTH sides scale with SF, so the broadcast trick of
    j6_range_join is unavailable; binned_range_join (operators/rangejoin.py)
    turns the interval predicate into one equi shuffle on a bin key with
    replication factor ≤ 2 (bin_width = interval span), instead of the
    planner's O(n·m) broadcast-nested-loop fallback."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(
            "s_suppkey",
            (F.col("s_acctbal") - 50).alias("lo"),
            (F.col("s_acctbal") + 50).alias("hi"),
        )
    )
    pairs = binned_range_join(
        cust, supp, point_on="c_acctbal", lower="lo", upper="hi", bin_width=100.0
    )
    return pairs.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_close"),
        money(F.sum(dec2("c_acctbal"))).alias("sum_bal"),
    )


@query(
    "j7_asof_join",
    oracle="""
    SELECT c.event_id,
           (SELECT p.event_id FROM events p
            WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
              AND (p.ts, p.event_id) <= (c.ts, c.event_id)
            ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS event_id_asof
    FROM events c WHERE c.event_type = 'click'
    """,
)
def j7_asof_join(spark, sf_dir):
    """As-of join: each click annotated with the latest preceding purchase by
    the same user. Union-trick implementation (operators/asof.py) — one
    shuffle + one sort, no range-join candidate explosion."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join(
        clicks.select("user_id", "ts", "event_id"),
        purchases.select("user_id", "ts", "event_id"),
        on=["user_id"],
        ts="ts",
        seq="event_id",
        value_cols=["event_id"],
    )
    return joined.select("event_id", "event_id_asof")


@query(
    "j9_salted_skew_join",
    oracle="""
    SELECT s_nationkey,
           count(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def j9_salted_skew_join(spark, sf_dir):
    """Skew-salted fact⋈dim join (operators/skew.py): the big side carries
    a deterministic 16-bucket salt, the small side is replicated once per
    bucket, and the join key becomes (suppkey, salt) — a hot supplier's
    probe rows land on 16 tasks instead of one. The result is provably
    identical to the plain join (each big row keeps exactly its original
    matches — pinned by test_salted_join_matches_plain), so the oracle is
    the unsalted SQL. This is the fallback for skew AQE cannot split:
    forced sort-merge joins and skew created upstream of the exchange.
    The post-join aggregate groups on s_nationkey, independent of the
    salt."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_quantity"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, supp, on=["l_suppkey"])
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
    )


@query(
    "j8_cross_join",
    oracle="SELECT n_name, r_name FROM nation CROSS JOIN region",
)
def j8_cross_join(spark, sf_dir):
    """Cartesian product of two tiny dims (25×5)."""
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    region = load_table(spark, sf_dir, "region").select("r_name")
    return nation.crossJoin(broadcast(region))


@query(
    "j10_fuzzy_join",
    oracle="""
    SELECT a.p_partkey AS id1, b.p_partkey AS id2,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND abs(length(a.p_name) - length(b.p_name)) <= 1
    WHERE levenshtein(a.p_name, b.p_name) <= 1
    """,
)
def j10_fuzzy_join(spark, sf_dir):
    """Fuzzy string self-join (edit distance ≤ 1) WITHOUT the quadratic
    cross join the oracle runs: a single edit cannot touch both the first
    k and the last k characters when 2k ≤ min length (k=3 here; shortest
    p_name is 7), so every qualifying pair shares its first-3 OR last-3
    characters exactly — equi-joining on those keys is a recall-complete
    candidate set (the PassJoin partitioning argument, simplified to one
    edit). That argument needs min length ≥ 6; names of length ≤ 6 route
    through an extra exact short-string band instead (one constant key —
    tiny class, any dist≤1 partner of a <6 name is itself ≤ 6 chars), so
    recall no longer silently depends on the data generator's min name
    length. All keys explode into ONE keyed frame (key kind rides in the
    join key), so each side scans part once instead of once per key — the
    union-of-two-joins form would plan the scan 4×. Candidates dedupe on
    the pair key (a pair sharing prefix AND suffix matches twice), then
    the cheap length-band filter and the exact levenshtein verify. At
    100 TB the keys get longer per length class (k = ⌊L/(d+1)⌋) to keep
    blocks small; the verify stays embarrassingly parallel either way.
    Spark's levenshtein returns INT — cast to BIGINT for the oracle's
    dtype."""
    parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")

    def keyed(side: str):
        return parts.select(
            F.col("p_partkey").alias(f"id{side}"),
            F.col("p_name").alias(f"name{side}"),
            F.explode(
                F.filter(
                    F.array(
                        F.concat(F.lit("p:"), F.substring("p_name", 1, 3)),
                        F.concat(F.lit("s:"), F.substring("p_name", -3, 3)),
                        F.when(F.length("p_name") <= 6, F.lit("x:short")),
                    ),
                    lambda c: c.isNotNull(),
                )
            ).alias("bkey"),
        )

    cand = (
        keyed("1")
        .join(keyed("2"), on="bkey")
        .filter(F.col("id1") < F.col("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cand.filter(
            F.abs(F.length("name1") - F.length("name2")) <= F.lit(1)
        )
        .withColumn("dist", F.levenshtein("name1", "name2").cast("long"))
        .filter(F.col("dist") <= 1)
        .select("id1", "id2", "dist")
    )


@query(
    "j11_asof_forward",
    oracle="""
    SELECT c.event_id,
           (SELECT p.event_id FROM events p
            WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
              AND (p.ts, p.event_id) >= (c.ts, c.event_id)
            ORDER BY p.ts, p.event_id LIMIT 1) AS event_id_asof
    FROM events c WHERE c.event_type = 'click'
    """,
)
def j11_asof_forward(spark, sf_dir):
    """FORWARD as-of join: each click annotated with the EARLIEST
    following purchase by the same user — the "time to next conversion"
    primitive (j7 is the backward twin). Same union-trick plan with the
    sort reversed (operators/asof.py direction="forward"): one shuffle on
    the key, one local sort, no range-join candidate explosion in either
    direction."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join(
        clicks.select("user_id", "ts", "event_id"),
        purchases.select("user_id", "ts", "event_id"),
        on=["user_id"],
        ts="ts",
        seq="event_id",
        value_cols=["event_id"],
        direction="forward",
    )
    return joined.select("event_id", "event_id_asof")


@query(
    "j12_interval_overlap_join",
    oracle="""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS sum_supp_bal
    FROM (SELECT c_custkey, c_nationkey,
                 c_acctbal - 250 AS c_lo, c_acctbal + 250 AS c_hi
          FROM customer) c
    JOIN (SELECT s_suppkey, s_acctbal,
                 s_acctbal - 250 AS s_lo, s_acctbal + 250 AS s_hi
          FROM supplier) s
      ON c.c_lo <= s.s_hi AND s.s_lo <= c.c_hi
    GROUP BY c_nationkey
    """,
)
def j12_interval_overlap_join(spark, sf_dir):
    """Interval×interval OVERLAP join — time-range conflict detection
    (bookings, maintenance windows, span intersection), here as ±250
    account-balance bands on BOTH customer and supplier. Neither side is
    broadcastable at scale and an interval has no single bin, so this
    runs through operators/rangejoin.binned_interval_overlap_join: each
    interval replicates to its covered bins, and a pair is emitted by
    exactly ONE owner bin (the overlap's left edge) — exactly-once
    semantics without a dedup shuffle. The oracle is the plain theta
    join."""
    from dmshadoop_spark.operators.rangejoin import binned_interval_overlap_join

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey",
        (F.col("c_acctbal") - 250).alias("c_lo"),
        (F.col("c_acctbal") + 250).alias("c_hi"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal",
        (F.col("s_acctbal") - 250).alias("s_lo"),
        (F.col("s_acctbal") + 250).alias("s_hi"),
    )
    pairs = binned_interval_overlap_join(
        cust, supp,
        left_lower="c_lo", left_upper="c_hi",
        right_lower="s_lo", right_upper="s_hi",
        bin_width=500.0,
    )
    return pairs.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        money(F.sum(dec2("s_acctbal"))).alias("sum_supp_bal"),
    )


@query(
    "j13_salted_join",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def j13_salted_join(spark, sf_dir):
    """Skew-mitigated join (operators/skew.py:salted_join) as a
    driver-checkable query: customer⋈nation is the canonical hot-key
    join (25 nation keys over the whole customer table — every key is
    "hot" relative to the dim). The big side salts on a deterministic
    row hash, the 25-row dim replicates once per salt bucket, and the
    result must hash-match the plain-join oracle: the fan-out changes
    task placement, never the match set. tests/test_plans.py pins that
    the salt reaches the join keys and the dim actually explodes."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey"), "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    joined = salted_join(cust, nation, ["n_nationkey"], salt_buckets=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(dec2("c_acctbal")).cast("double").alias("sum_acctbal"),
    )
