"""Event-time / streaming-shaped operators — SURVEY.md §2.10 (ST1-ST6).

The reference is synchronous request/response (nothing streams); these are
the batch-equivalent forms mandated by the north star. The *same* logical
expressions run under Structured Streaming via
``dmshadoop_spark.streaming`` (readStream → identical transforms →
writeStream), which the streaming tests verify — keeping these
oracle-checkable here while proving stream parity separately.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dmshadoop_spark.catalog import load_table
from dmshadoop_spark.functions.numeric import dec2, money
from dmshadoop_spark.registry import query

EVENT_WEIGHTS = [
    ("click", "1.00"),
    ("view", "0.50"),
    ("purchase", "10.00"),
    ("signup", "5.00"),
    ("error", "0.00"),
]


@query(
    "st1_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start,
           event_type,
           count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def st1_tumbling_window(spark, sf_dir):
    """Tumbling 5-minute window aggregate (epoch-aligned, matching DuckDB's
    time_bucket). Streaming form: identical groupBy under readStream with a
    watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "5 minutes").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dec2("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"), "event_type", "cnt", "sum_value"
        )
    )


@query(
    "st2_sliding_window",
    oracle="""
    SELECT w_start, event_type, count(*) AS cnt
    FROM (
        SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts)
                           - INTERVAL '5 minutes']) AS w_start,
               event_type
        FROM events
    ) GROUP BY w_start, event_type
    """,
)
def st2_sliding_window(spark, sf_dir):
    """Sliding window (10 min length, 5 min step) — each event lands in two
    windows; Spark's window() expands them natively."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "event_type", "cnt")
    )


@query(
    "st3_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    grouped AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS g
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) AS session_last,
           count(*) AS n_events
    FROM grouped GROUP BY user_id, g
    """,
)
def st3_session_window(spark, sf_dir):
    """Session windows (5-minute inactivity gap) per user. Spark's
    session_window merges overlapping [ts, ts+gap) intervals; the oracle
    reproduces that with the lag/cumsum islands idiom."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_last", "n_events")
    )


@query(
    "st4_watermark_filter",
    oracle="""
    SELECT event_type, count(*) AS cnt
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL '10 minutes'
    GROUP BY event_type
    """,
)
def st4_watermark_filter(spark, sf_dir):
    """Batch equivalent of a 10-minute watermark: keep events no older than
    max(ts) - 10min (the same late-data cutoff withWatermark enforces in the
    streaming form)."""
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(broadcast(max_ts))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 10 MINUTES"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "st5_stateful_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def st5_stateful_dedup(spark, sf_dir):
    """Key dedup — dropDuplicates; under streaming the same call keeps state
    bounded by the watermark."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )


@query(
    "st6_stream_static_join",
    oracle="""
    SELECT event_type,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))
                          * CAST(weight AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS weighted_value
    FROM events
    JOIN (VALUES ('click','1.00'), ('view','0.50'), ('purchase','10.00'),
                 ('signup','5.00'), ('error','0.00'))
         AS w(event_type, weight)
    USING (event_type)
    GROUP BY event_type
    """,
)
def st6_stream_static_join(spark, sf_dir):
    """Stream⋈static-dimension join (broadcast; identical API in streaming)."""
    ev = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(EVENT_WEIGHTS, "event_type string, weight string")
    return (
        ev.join(broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            money(F.sum(dec2("value") * dec2("weight"))).alias("weighted_value")
        )
    )


@query(
    "st7_stateful_user_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events, max(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def st7_stateful_user_totals(spark, sf_dir):
    """ST7: custom stateful operator — this entry runs the REAL
    Structured Streaming path (file source → applyInPandasWithState →
    availableNow drain), then keeps each user's final emission. The
    oracle is the batch groupBy the cumulative state must converge to;
    an actual stream execution hash-matching a SQL aggregate is the
    strongest statefulness check the driver contract allows."""
    from pyspark.sql import Window

    from dmshadoop_spark.streaming import (
        read_events_stream,
        run_to_memory,
        streaming_user_totals_stateful,
    )

    workdir = _stream_workdir("st7")
    src = f"{workdir}/events"
    # Re-write through the catalog so the stream source sees plain NTZ
    # (the raw testdata stores TIMESTAMP(NANOS); see read_events_stream).
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    stream = streaming_user_totals_stateful(
        read_events_stream(spark, src, max_files_per_trigger=None)
    )
    name = run_to_memory(stream, f"{workdir}/ckpt", output_mode="update")
    emissions = spark.table(name)
    last = Window.partitionBy("user_id").orderBy(F.desc("n_updates"))
    return (
        emissions.withColumn("rn", F.row_number().over(last))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "max_value")
    )


@query(
    "st8_interval_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def st8_interval_join(spark, sf_dir):
    """ST8 batch twin: event-time interval join — purchases attribute to
    same-user clicks within the preceding 10 minutes. Equi-join on
    user_id carries the shuffle; the time-range rides as a residual
    predicate on the sort-merge join (never a nested-loop range join).
    The streaming form (streaming.streaming_interval_join) watermarks
    both sides so join state expires; tests/test_streaming.py proves the
    two produce identical rows on the same input."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")
        )
    )
    return clicks.join(purchases, cond).select(
        "user_id", "click_id", "purchase_id"
    )


def _stream_workdir(query: str) -> str:
    """Per-process reusable scratch dir (see workdirs.scratch_dir): st10's
    result DF lazily reads its state snapshot, so a mkdtemp-per-invocation
    can never be deleted safely and accumulates; this reuses one footprint
    per process instead."""
    from dmshadoop_spark.workdirs import scratch_dir

    return scratch_dir(f"stream_{query}")


@query(
    "st9_dedup_within_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def st9_dedup_within_watermark(spark, sf_dir):
    """ST9: REAL streaming run of ``dropDuplicatesWithinWatermark`` (file
    source → availableNow drain → memory sink), the state-*evicting* dedup
    for at-least-once sources whose duplicates carry different timestamps
    — plain dropDuplicates (st5) keeps every key forever; this one frees a
    key once the watermark passes its window. The delay spans the whole
    test input, so the emitted rows are exactly the distinct key set and
    the batch DISTINCT is a true oracle. Keys project AFTER dedup: which
    physical row wins per key depends on arrival order, the key set does
    not."""
    from dmshadoop_spark.streaming import (
        read_events_stream,
        run_to_memory,
        streaming_dedup_within_watermark,
    )

    workdir = _stream_workdir("st9")
    src = f"{workdir}/events"
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    stream = streaming_dedup_within_watermark(
        read_events_stream(spark, src, max_files_per_trigger=None)
    )
    name = run_to_memory(stream, f"{workdir}/ckpt")
    return spark.table(name).select("user_id", "event_type").dropDuplicates()


@query(
    "st10_foreach_batch_upsert",
    oracle="""
    SELECT user_id, ts AS last_ts, event_id AS last_event_id,
           value AS last_value
    FROM (SELECT user_id, ts, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def st10_foreach_batch_upsert(spark, sf_dir):
    """ST10: ``foreachBatch`` upsert — a real multi-micro-batch stream
    (4 source files, one per trigger) maintaining a latest-row-per-user
    serving table through merge-and-swap snapshots
    (streaming/streams.py:run_foreach_batch_upsert). The per-batch
    reduction is max over a (ts, event_id, value) struct — commutative
    and associative — so the final snapshot equals the batch arg-max
    regardless of how the source splits into batches; that equality IS
    the oracle. The same pattern targets Delta MERGE / JDBC upsert in
    production; parquet-snapshot-swap is the dependency-free stand-in."""
    from dmshadoop_spark.streaming import (
        read_events_stream,
        run_foreach_batch_upsert,
    )

    workdir = _stream_workdir("st10")
    src = f"{workdir}/events"
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4, "user_id").write.mode("overwrite").parquet(src)
    state_dir = f"{workdir}/state"
    run_foreach_batch_upsert(
        read_events_stream(spark, src, max_files_per_trigger=1),
        state_dir,
        f"{workdir}/ckpt",
    )
    return spark.read.parquet(state_dir)


@query(
    "st11_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def st11_stream_stream_join(spark, sf_dir):
    """ST11: REAL stream⋈stream run of the interval join (st8's batch twin
    executes the same predicate as a static join) — two file-source
    streams over the same events table, watermarks on BOTH sides bounding
    join state, availableNow drain to a memory sink. An inner stream-
    stream join emits exactly the matched pairs once both sides replay,
    so the batch interval-join SQL is a true oracle — an actual
    Structured Streaming join execution hash-matching a static join is
    the strongest stream-stream check the driver contract allows. State
    scale: (watermark delay + interval) × per-user arrival rate per side,
    partitioned by the user_id equi-key."""
    from dmshadoop_spark.streaming import (
        read_events_stream,
        run_to_memory,
        streaming_interval_join,
    )

    workdir = _stream_workdir("st11")
    src = f"{workdir}/events"
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    clicks = read_events_stream(spark, src, max_files_per_trigger=None).filter(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, src, max_files_per_trigger=None).filter(
        F.col("event_type") == "purchase"
    )
    joined = streaming_interval_join(clicks, purchases)
    name = run_to_memory(joined, f"{workdir}/ckpt")
    return spark.table(name)


@query(
    "st12_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start,
           event_type,
           count(*) AS cnt
    FROM events GROUP BY 1, 2
    """,
)
def st12_stream_tumbling(spark, sf_dir):
    """ST12: REAL streaming run of the watermarked tumbling-window count
    (st1's batch twin is expression-identical; this executes the actual
    readStream → window groupBy → complete-mode drain). Complete mode
    emits the final state of every window after the availableNow drain,
    which equals the batch GROUP BY — the watermark bounds state during
    the run but the single-drain output is total. The strongest windowed-
    aggregation check the driver contract allows: an actual stream
    execution hash-matched against SQL."""
    from dmshadoop_spark.streaming import (
        read_events_stream,
        run_to_memory,
        streaming_tumbling_counts,
    )

    workdir = _stream_workdir("st12")
    src = f"{workdir}/events"
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    stream = streaming_tumbling_counts(
        read_events_stream(spark, src, max_files_per_trigger=None)
    )
    name = run_to_memory(stream, f"{workdir}/ckpt", output_mode="complete")
    return spark.table(name)


@query(
    "st13_stream_sliding",
    oracle="""
    SELECT w_start, event_type, count(*) AS n_events
    FROM (
        SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts)
                           - INTERVAL '5 minutes']) AS w_start,
               event_type
        FROM events
    ) GROUP BY w_start, event_type
    """,
)
def st13_stream_sliding(spark, sf_dir):
    """ST13: REAL streaming run of the watermarked SLIDING-window count
    (each event lands in window_len/slide = 2 windows). Complete-mode
    availableNow drain emits every window's final state, equal to the
    batch double-unnest oracle regardless of arrival order — sliding
    windows are order-insensitive aggregations, the safe class under
    per-file triggers (see read_events_stream's watermark note)."""
    from dmshadoop_spark.streaming import (
        read_events_stream,
        run_to_memory,
        streaming_sliding_counts,
    )

    workdir = _stream_workdir("st13")
    src = f"{workdir}/events"
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    stream = streaming_sliding_counts(
        read_events_stream(spark, src, max_files_per_trigger=None)
    )
    name = run_to_memory(stream, f"{workdir}/ckpt", output_mode="complete")
    return spark.table(name).select(
        F.col("window_start").alias("w_start"), "event_type", "n_events"
    )


@query(
    "st14_stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    grouped AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS g
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           count(*) AS n_events
    FROM grouped GROUP BY user_id, g
    """,
)
def st14_stream_session(spark, sf_dir):
    """ST14: REAL streaming run of SESSION windows (5-minute inactivity
    gap) — the stateful merge-on-overlap window Spark tracks per user.
    Single-batch drain (max_files_per_trigger=None): session merging is
    order-sensitive across micro-batch boundaries (a late file could
    bridge two already-emitted sessions), so exact batch parity requires
    event-time-ordered arrival — one batch is the degenerate ordered
    case, per read_events_stream's documented contract. The oracle is
    the batch lag/cumsum islands idiom (st3's)."""
    from dmshadoop_spark.streaming import (
        read_events_stream,
        run_to_memory,
        streaming_session_counts,
    )

    workdir = _stream_workdir("st14")
    src = f"{workdir}/events"
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    stream = streaming_session_counts(
        read_events_stream(spark, src, max_files_per_trigger=None)
    )
    name = run_to_memory(stream, f"{workdir}/ckpt", output_mode="complete")
    return spark.table(name)


@query(
    "st15_stream_watermark_latedrop",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    lateset AS (
        SELECT e.*, (e.ts > mx.m - INTERVAL '12 hours') AS above
        FROM events e, mx
        WHERE e.event_id % 7 = 3
          AND (e.ts <= mx.m - INTERVAL '48 hours'
               OR (e.ts > mx.m - INTERVAL '12 hours' AND e.ts < mx.m))
    ),
    ontime AS (
        SELECT e.ts, e.event_type FROM events e, mx
        WHERE NOT (e.event_id % 7 = 3
                   AND (e.ts <= mx.m - INTERVAL '48 hours'
                        OR (e.ts > mx.m - INTERVAL '12 hours'
                            AND e.ts < mx.m)))
    ),
    surviving AS (
        SELECT ts, event_type FROM ontime
        UNION ALL
        SELECT ts, event_type FROM lateset WHERE above
    )
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start,
           event_type,
           count(*) AS cnt
    FROM surviving GROUP BY 1, 2
    """,
)
def st15_stream_watermark_latedrop(spark, sf_dir):
    """ST15: REAL watermark late-data DROP (the last batch-twin in the ST
    family — round-9 verdict task 8). st4 checks the 10-minute cutoff as
    a batch filter and st12 runs the watermarked window in complete mode
    (state bounded, nothing dropped in a single drain); here the stream
    executes THREE micro-batches in update mode over a staged file
    source (streaming/streams.py write_two_phase_source): the early
    commits advance the watermark to max(on-time ts) − 24h (the empty
    middle batch exists because the late-input filter runs one batch
    behind the eviction watermark — measured, see the helper's
    docstring), and the late batch's sub-watermark rows are genuinely
    discarded by the stateful aggregation while its above-watermark
    rows are admitted (both tiers non-empty at every SF). The late set
    is constructed hours clear of the watermark boundary in both
    directions, so the drop set is exact and
    the DuckDB oracle replays it as a window-end filter: on-time rows +
    late rows above the watermark, tumbling 5-minute counts. The memory
    sink in update mode logs every per-batch revision of a window's
    count; counts only grow, so max(cnt) per (window, type) is the final
    state."""
    from dmshadoop_spark.streaming import (
        read_events_stream,
        run_to_memory,
        streaming_latedrop_counts,
        write_two_phase_source,
    )

    workdir = _stream_workdir("st15")
    src = f"{workdir}/events"
    write_two_phase_source(spark, load_table(spark, sf_dir, "events"), src)
    stream = streaming_latedrop_counts(
        read_events_stream(spark, src, max_files_per_trigger=1)
    )
    name = run_to_memory(stream, f"{workdir}/ckpt", output_mode="update")
    return (
        spark.table(name)
        .groupBy("w_start", "event_type")
        .agg(F.max("cnt").alias("cnt"))
    )
