"""Stream/batch parity: the ST* streaming forms must produce exactly the
rows their oracle-checked batch twins produce on the same input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dmshadoop_spark.catalog import load_table
from dmshadoop_spark.streaming import (
    read_events_stream,
    run_to_memory,
    streaming_dedup,
    streaming_tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory, sf_dir):
    """Re-write events through the catalog (normalizing the NANOS ts) into a
    stream-source directory."""
    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(out)
    return out


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_tumbling_matches_batch(spark, events_dir, tmp_path):
    stream = streaming_tumbling_counts(read_events_stream(spark, events_dir))
    name = run_to_memory(
        stream, str(tmp_path / "ckpt1"), output_mode="complete"
    )
    got = _rows(spark.table(name))

    batch = (
        spark.read.parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("w_start"),
                "event_type", "cnt")
    )
    assert got == _rows(batch)


def test_streaming_dedup_matches_batch(spark, events_dir, tmp_path):
    stream = streaming_dedup(read_events_stream(spark, events_dir)).select(
        "user_id", "event_type"
    )
    name = run_to_memory(stream, str(tmp_path / "ckpt2"))
    got = _rows(spark.table(name))

    batch = spark.read.parquet(events_dir).select("user_id", "event_type").distinct()
    assert got == _rows(batch)


def test_streaming_session_matches_batch(spark, events_dir, tmp_path):
    from dmshadoop_spark.streaming import streaming_session_counts

    # Sessions need event-time-ordered arrival for exact parity (late rows
    # beyond the watermark are *correctly* dropped otherwise) → one batch.
    stream = streaming_session_counts(
        read_events_stream(spark, events_dir, max_files_per_trigger=None)
    )
    name = run_to_memory(
        stream, str(tmp_path / "ckpt3"), output_mode="complete"
    )
    got = _rows(spark.table(name))

    batch = (
        spark.read.parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("session_start"),
                "user_id", "n_events")
    )
    assert got == _rows(batch)


def test_streaming_static_join_matches_batch(spark, events_dir, tmp_path):
    from dmshadoop_spark.streaming import streaming_stream_static_join

    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5)], "event_type string, weight double"
    )
    stream = streaming_stream_static_join(
        read_events_stream(spark, events_dir), dim
    )
    name = run_to_memory(stream, str(tmp_path / "ckpt4"))
    got = _rows(spark.table(name))

    batch = (
        spark.read.parquet(events_dir)
        .join(dim, "event_type")
        .select("event_id", "event_type", "weight")
    )
    assert got == _rows(batch)


def test_streaming_sliding_matches_batch(spark, events_dir, tmp_path):
    from dmshadoop_spark.streaming import streaming_sliding_counts

    stream = streaming_sliding_counts(read_events_stream(spark, events_dir))
    name = run_to_memory(
        stream, str(tmp_path / "ckpt5"), output_mode="complete"
    )
    got = _rows(spark.table(name))

    batch = (
        spark.read.parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                "event_type", "n_events")
    )
    assert got == _rows(batch)


def test_stateful_user_totals_accumulates_across_batches(
    spark, events_dir, tmp_path
):
    """ST7: applyInPandasWithState must carry state across micro-batches —
    maxFilesPerTrigger=1 over the 4-file source forces 4 batches, so any
    state loss (or per-batch reset) shows up as undercounted totals. The
    final emission per user must equal the batch groupBy over everything."""
    from pyspark.sql import Window

    from dmshadoop_spark.streaming import streaming_user_totals_stateful

    stream = streaming_user_totals_stateful(
        read_events_stream(spark, events_dir, max_files_per_trigger=1)
    )
    name = run_to_memory(
        stream, str(tmp_path / "ckpt_st7"), output_mode="update"
    )
    emissions = spark.table(name)
    # Multi-batch proof: at least one user must have been emitted more
    # than once (otherwise this test degenerates to single-batch).
    assert emissions.groupBy("user_id").count().filter("count > 1").count() > 0
    last = Window.partitionBy("user_id").orderBy(F.desc("n_updates"))
    got = _rows(
        emissions.withColumn("rn", F.row_number().over(last))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "max_value")
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
        )
    )
    assert got == _rows(batch)


def test_streaming_interval_join_matches_batch(spark, events_dir, tmp_path):
    """ST8: the watermarked stream-stream interval join emits exactly the
    batch join's rows when the source drains in one availableNow batch."""
    from dmshadoop_spark.streaming import (
        read_events_stream,
        run_to_memory,
        streaming_interval_join,
    )

    src = read_events_stream(spark, events_dir, max_files_per_trigger=None)
    clicks = src.filter(F.col("event_type") == "click")
    purchases = src.filter(F.col("event_type") == "purchase")
    stream = streaming_interval_join(clicks, purchases)
    name = run_to_memory(stream, str(tmp_path / "ckpt_ij"))
    got = _rows(spark.table(name))

    ev = spark.read.parquet(events_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    batch = c.join(
        p,
        (F.col("user_id") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 10 MINUTES")),
    ).select("user_id", "click_id", "purchase_id")
    assert got == _rows(batch)
    assert got  # non-degenerate: the testdata produces matches


def test_streaming_ingest_into_store(spark, tmp_path):
    """Structured Streaming → DocumentStore: foreachBatch feeds each
    micro-batch through bulk_ingest, so streaming ingest gets the same
    atomic generation commits and set-oriented version assignment as
    batch. Versions must come out dense per name no matter how the
    stream batches the files."""
    from dmshadoop_spark.dms import DocumentStore

    src = str(tmp_path / "src")
    rows = [
        (f"doc{i % 4}.txt", f"content-{i}".encode()) for i in range(12)
    ]
    df = spark.createDataFrame(rows, "name string, content binary")
    df.repartition(3).write.parquet(src)

    store = DocumentStore(spark, str(tmp_path / "dms"))
    stream = (
        spark.readStream.schema("name string, content binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: store.bulk_ingest(bdf.select("name", "content"))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_ingest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    final = store.df()
    assert final.count() == 12
    per_name = {
        r["name"]: r["versions"]
        for r in final.groupBy("name")
        .agg(F.sort_array(F.collect_list("version")).alias("versions"))
        .collect()
    }
    assert set(per_name) == {"doc0.txt", "doc1.txt", "doc2.txt", "doc3.txt"}
    for vs in per_name.values():
        assert vs == [1, 2, 3], per_name
    # one committed generation per non-empty micro-batch, all readable
    gens = store.history()
    assert len(gens) >= 3
    for g in gens:
        store.df(g).count()


def test_foreach_batch_upsert_replay_idempotent(spark, events_dir, tmp_path):
    """ST10's merge (operators/merge.py with matched_update =
    greatest(t.s, s.s) since round 5) must keep the commutative-reduce
    property that makes at-least-once redelivery safe: re-running the
    WHOLE stream against an existing snapshot (fresh checkpoint → every
    micro-batch redelivered) must leave the snapshot byte-for-byte
    unchanged, because max(x, x) = x."""
    from dmshadoop_spark.streaming import read_events_stream
    from dmshadoop_spark.streaming.streams import run_foreach_batch_upsert

    state = str(tmp_path / "state")
    run_foreach_batch_upsert(
        read_events_stream(spark, events_dir),
        state,
        str(tmp_path / "ckpt1"),
    )
    once = _rows(spark.read.parquet(state))
    assert once  # non-empty keyed snapshot
    run_foreach_batch_upsert(
        read_events_stream(spark, events_dir),
        state,
        str(tmp_path / "ckpt2"),  # fresh checkpoint = full redelivery
    )
    assert _rows(spark.read.parquet(state)) == once


def test_latedrop_stream_actually_drops(spark, sf_dir, tmp_path):
    """ST15's claim is a REAL watermark drop, not just a hash match:
    the staged three-file source must produce (1) ≥3 micro-batches,
    (2) a numRowsDroppedByWatermark equal to the dropped tier's exact
    row count, and (3) admitted-late rows incrementing their windows —
    pinned against the same predicates the DuckDB oracle replays."""
    from dmshadoop_spark.streaming import (
        read_events_stream,
        streaming_latedrop_counts,
        write_two_phase_source,
    )

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events")
    write_two_phase_source(spark, ev, src)

    mx = ev.agg(F.max("ts").alias("m"))
    tiers = (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.col("event_id") % 7 == 3)
        .select(
            (F.col("ts") <= F.col("m") - F.expr("INTERVAL 48 HOURS")).alias(
                "dropped"
            ),
            (
                (F.col("ts") > F.col("m") - F.expr("INTERVAL 12 HOURS"))
                & (F.col("ts") < F.col("m"))
            ).alias("admitted"),
        )
        .agg(
            F.sum(F.col("dropped").cast("long")).alias("n_drop"),
            F.sum(F.col("admitted").cast("long")).alias("n_admit"),
        )
        .first()
    )
    assert tiers["n_drop"] > 0, "fixture must exercise the drop"

    stream = streaming_latedrop_counts(
        read_events_stream(spark, src, max_files_per_trigger=1)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("latedrop_pin")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.recentProgress
    assert len(progress) >= 3
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in progress
        if p["stateOperators"]
    )
    assert dropped == tiers["n_drop"], (dropped, tiers["n_drop"])
