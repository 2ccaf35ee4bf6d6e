"""Window functions — SURVEY.md §2.5 (W1-W6).

W1/W2 are the reference's core versioning semantics done declaratively:
latest-row-per-group (default-version resolution, src/DMS.py:185-186 etc.)
and next-version assignment (the O(n)-scans probe loop, src/DMS.py:113-117,
replaced by one windowed max). Every window orders by a unique tie-break so
results are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dmshadoop_spark.catalog import load_table
from dmshadoop_spark.functions.numeric import dec2, money
from dmshadoop_spark.registry import query


@query(
    "w1_latest_per_group",
    oracle="""
    SELECT source, doc_id, n_chars FROM (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY doc_id DESC) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
)
def w1_latest_per_group(spark, sf_dir):
    """Latest row per group — the reference's default-version resolution
    (get_lastest_version used by 5 methods, src/DMS.py:186,211,287,321,337).
    One shuffle on the group key; no self-join."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "doc_id", "n_chars")
    )


@query(
    "w2_next_version",
    oracle="""
    SELECT DISTINCT o_custkey,
           max(o_orderkey) OVER (PARTITION BY o_custkey) + 1 AS next_key
    FROM orders
    """,
)
def w2_next_version(spark, sf_dir):
    """Next-version assignment — replaces the reference's per-upload probe
    loop (src/DMS.py:113-117, O(versions) table scans each) with one
    windowed max."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return orders.select(
        "o_custkey", (F.max("o_orderkey").over(w) + 1).alias("next_key")
    ).distinct()


@query(
    "w3_rank",
    oracle="""
    SELECT c_nationkey, c_custkey, rnk FROM (
        SELECT c_nationkey, c_custkey,
               rank() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer
    ) WHERE rnk <= 3
    """,
)
def w3_rank(spark, sf_dir):
    """Top-3 customers per nation by balance (rank with unique tie-break)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "rnk")
    )


@query(
    "w4_lag",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2))
                      - lag(CAST(o_totalprice AS DECIMAL(18,2)))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey), 2)
                AS DOUBLE) AS price_delta
    FROM orders
    """,
)
def w4_lag(spark, sf_dir):
    """lag — version-chain diffing (natural extension of the reference's
    version lists, src/DMS.py:377-383). NULL for each customer's first order."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    delta = dec2("o_totalprice") - F.lag(dec2("o_totalprice")).over(w)
    return orders.select(
        "o_orderkey", "o_custkey", money(delta).alias("price_delta")
    )


@query(
    "w5_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value
    FROM events
    """,
)
def w5_running_sum(spark, sf_dir):
    """Running (frame) aggregate in exact decimal — order-stable by design."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec2("value")).over(w).cast("double").alias("running_value"),
    )


@query(
    "w6_ntile",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT)
               AS quartile
    FROM customer
    """,
)
def w6_ntile(spark, sf_dir):
    """Exact ntile(4) WITHOUT the single-partition global window (the
    round-1 registration funneled the whole table through one task's
    sort): range-repartition on the unique sort key, row_number per range
    partition in parallel, then reconstruct each row's GLOBAL rank by
    adding broadcast per-partition offsets (two-phase global row_number;
    the offsets table is one tiny P-row aggregate). The quartile is then
    pure arithmetic on (rank, N) replicating ntile's uneven-tile rule —
    the first N%4 tiles get one extra row. Bit-identical to
    ntile(4) OVER (ORDER BY ...) for any partition count: range
    boundaries shift with sampling, but local-rank + offset reconstructs
    the same total order, so the oracle is unchanged."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    n_parts = 8  # scale with cluster width; result is invariant to it
    ranged = cust.repartitionByRange(
        n_parts, "c_acctbal", "c_custkey"
    ).withColumn("pid", F.spark_partition_id())
    local_w = Window.partitionBy("pid").orderBy("c_acctbal", "c_custkey")
    local = ranged.withColumn("lr", F.row_number().over(local_w))
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    # P-row bookkeeping window: cumulative offset + grand total. Tiny by
    # construction (one row per range partition), so the single-partition
    # window here is over P rows, never the table.
    off_w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    tot_w = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(off_w), F.lit(0)).alias("off"),
        F.sum("cnt").over(tot_w).alias("n_total"),
    )
    ranked = local.join(broadcast(offsets), "pid").withColumn(
        "rnk", F.col("off") + F.col("lr")
    )
    # ntile(4) arithmetic: base = N div 4, rem = N % 4; tiles 1..rem have
    # base+1 rows. CASE short-circuits, so base = 0 (N < 4) never divides.
    quartile = F.expr(
        """CASE WHEN rnk <= (n_total % 4) * ((n_total div 4) + 1)
                THEN (rnk - 1) div ((n_total div 4) + 1) + 1
                ELSE (n_total % 4)
                     + (rnk - (n_total % 4) * ((n_total div 4) + 1) - 1)
                       div (n_total div 4) + 1
           END"""
    )
    return ranked.select(
        "c_custkey", quartile.cast("long").alias("quartile")
    )


@query(
    "w8_gaps_islands",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id,
               date_diff('second', TIMESTAMP '1970-01-01', ts) AS eps
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, eps,
               CASE WHEN eps - lag(eps) OVER (PARTITION BY user_id
                                              ORDER BY eps, event_id) <= 1800
                    THEN 0 ELSE 1 END AS new_sess
        FROM e
    ),
    sess AS (
        SELECT user_id, eps,
               CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                        ORDER BY eps, event_id
                                        ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(eps) AS sess_start,
           max(eps) - min(eps) AS sess_dur_s
    FROM sess GROUP BY user_id, session_id
    """,
)
def w8_gaps_islands(spark, sf_dir):
    """Batch sessionization (gaps-and-islands): events more than 30 minutes
    apart start a new session. The batch twin of ST3's streaming session
    window — lag flags the gap, a running sum numbers the island, one
    groupBy collapses it. All three steps share ONE shuffle on user_id
    (the two windows and the final aggregate hash-partition on the same
    key, so Catalyst reuses the exchange), and everything is integer
    arithmetic on epoch seconds — exact in any engine at any parallelism.
    lag(NULL) on each user's first event makes the <= comparison NULL →
    new_sess=1, same rule both engines."""
    ev = load_table(spark, sf_dir, "events")
    eps = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    order_w = Window.partitionBy("user_id").orderBy("eps", "event_id")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.select("user_id", "event_id", eps.alias("eps")).withColumn(
        "new_sess",
        F.when(
            F.col("eps") - F.lag("eps").over(order_w) <= 1800, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    sess = flagged.withColumn("session_id", F.sum("new_sess").over(run_w))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("eps").alias("sess_start"),
        (F.max("eps") - F.min("eps")).alias("sess_dur_s"),
    )


@query(
    "w7_rolling_time_range",
    oracle="""
    SELECT event_id,
           count(*) OVER (
               PARTITION BY user_id
               ORDER BY date_diff('second', TIMESTAMP '1970-01-01', ts)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS n_last_hour
    FROM events
    """,
)
def w7_rolling_time_range(spark, sf_dir):
    """Time-based RANGE frame — each event's count of same-user events in
    the trailing hour (the hypertable-rollup / sliding-metric shape, but
    exact per row instead of bucketed). RANGE frames are tie-safe: all
    rows with equal timestamps share one frame, so the result is
    deterministic under any shuffle order. Epoch seconds come from pure
    NTZ arithmetic (no session-zone dependence); the window partitions by
    user — no global sort, parallel across users at any scale."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ep = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy(ep).rangeBetween(-3600, 0)
    return ev.select(
        "event_id", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )


@query(
    "w9_funnel",
    oracle="""
    WITH flagged AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END)
                   OVER (PARTITION BY user_id) AS signup_ts,
               event_type, ts
        FROM events)
    SELECT user_id,
           max(CASE WHEN event_type = 'purchase' AND ts > signup_ts
                    THEN 1 ELSE 0 END) AS converted,
           CAST(sum(CASE WHEN event_type = 'purchase' AND ts > signup_ts
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases_after,
           min(CASE WHEN event_type = 'purchase' AND ts > signup_ts
                    THEN ts END) AS first_purchase_ts
    FROM flagged GROUP BY user_id
    """,
)
def w9_funnel(spark, sf_dir):
    """Conversion-funnel detection (signup → later purchase per user) in ONE
    scan and ONE shuffle: an unordered full-partition window broadcasts each
    user's earliest signup to every row of that user, and the follow-up
    aggregate groups on the SAME key, so Catalyst reuses the exchange. The
    membership formulation ("join each purchase against the user's signup
    set") would scan events twice; the window-over-key form is the x9
    pattern applied to sequential/funnel analytics. State per partition is
    O(1) streaming aggregation — no collected lists, hot users cost a
    partition scan, never a product."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    signup_ts = F.min(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    flagged = ev.select("user_id", "event_type", "ts").withColumn(
        "signup_ts", signup_ts
    )
    after = (F.col("event_type") == "purchase") & (
        F.col("ts") > F.col("signup_ts")
    )
    conv = F.when(after, F.lit(1)).otherwise(F.lit(0))
    return flagged.groupBy("user_id").agg(
        F.max(conv).alias("converted"),
        F.sum(conv).cast("long").alias("n_purchases_after"),
        F.min(F.when(after, F.col("ts"))).alias("first_purchase_ts"),
    )


@query(
    "w10_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               time_bucket(INTERVAL '5 minutes', min(ts)) AS lo,
               time_bucket(INTERVAL '5 minutes', max(ts)) AS hi
        FROM events WHERE user_id < 20 GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(lo, hi,
                                               INTERVAL '5 minutes')) AS slot
        FROM bounds
    ),
    slotted AS (
        SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS slot,
               count(*) AS n_events
        FROM events WHERE user_id < 20 GROUP BY 1, 2
    )
    SELECT g.user_id, g.slot,
           COALESCE(s.n_events, 0) AS n_events,
           CAST(max(CASE WHEN s.n_events IS NOT NULL THEN g.slot END)
                    OVER (PARTITION BY g.user_id ORDER BY g.slot
                          ROWS UNBOUNDED PRECEDING)
                AS TIMESTAMP) AS last_active_slot
    FROM grid g LEFT JOIN slotted s USING (user_id, slot)
    """,
)
def w10_gap_fill(spark, sf_dir):
    """Time-series resample + gap fill — the missing-bucket problem every
    monitoring/feature pipeline hits: aggregations only emit buckets that
    HAVE data, so downstream rolling features silently skip quiet
    periods. Per user: build the dense 5-minute grid between first and
    last activity with ``sequence()`` (expression-generated — no driver
    loop, no range table), left-join the real per-slot counts, zero-fill,
    and forward-fill the last active slot with a running ``max`` window
    (ignore-null forward fill as an order-insensitive aggregate, so it's
    deterministic under any shuffle order).

    Scale: the grid explode is per-user-bounded (span/5min rows); the
    join key (user_id, slot) is uniform; both sides pre-aggregate before
    the join so the exchange carries bucket counts, never raw events.
    The user_id<20 cut keeps the driver-gate result bounded — the plan
    is cut-independent."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    slot = F.expr(
        "timestampadd(MINUTE, -(minute(ts) % 5),"
        " CAST(date_trunc('minute', ts) AS TIMESTAMP_NTZ))"
    )
    slotted = ev.select("user_id", slot.alias("slot")).groupBy(
        "user_id", "slot"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = slotted.groupBy("user_id").agg(
        F.min("slot").alias("lo"), F.max("slot").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 5 MINUTES"))
        ).alias("slot"),
    )
    joined = grid.join(slotted, ["user_id", "slot"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "slot",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.max(
            F.when(F.col("n_events").isNotNull(), F.col("slot"))
        ).over(w).alias("last_active_slot"),
    )


@query(
    "w11_window_fn_suite",
    oracle="""
    SELECT user_id, event_id,
           CAST(round(percent_rank() OVER w * 1000000) AS BIGINT)
               AS pct_rank_e6,
           CAST(round(cume_dist() OVER w * 1000000) AS BIGINT)
               AS cume_dist_e6,
           first_value(event_id) OVER w AS first_eid,
           nth_value(event_id, 3) OVER w AS third_eid
    FROM events WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w11_window_fn_suite(spark, sf_dir):
    """The remaining rank-family window functions in one pass:
    percent_rank, cume_dist (both scaled to exact integers at 1e-6
    precision — the underlying ratios are exact rationals, so round()
    of the same double is engine-identical), first_value and nth_value
    over an explicit unbounded frame (nth_value defaults differ between
    engines; the frame pins them). One window spec → one sort per
    partition, all four functions share it."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w_rank = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_frame = w_rank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.percent_rank().over(w_rank) * 1000000)
        .cast("long")
        .alias("pct_rank_e6"),
        F.round(F.cume_dist().over(w_rank) * 1000000)
        .cast("long")
        .alias("cume_dist_e6"),
        F.first("event_id").over(w_frame).alias("first_eid"),
        F.nth_value("event_id", 3).over(w_frame).alias("third_eid"),
    )
