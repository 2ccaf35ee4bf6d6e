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
# ROUND-4 DECISION: CORRECTNESS_r03 ran 50/50 green; cumulative
# driver-confirmed coverage is 143 of the 183 queries registered through
# round 3. This window was REGENERATED FROM LIVE STATE (round-3 VERDICT
# item 1: set(QUERIES) − cumulative_green over CORRECTNESS_r0{1,2,3},
# tools/rotation.py — not the round-3 comment, which had gone stale by
# omitting j11_asof_forward): 3 canaries + all 28 oracle-backed
# unconfirmed queries (the 24 deferred from round 3, plus j11, plus the
# four new round-4 entries s20/t11/x24/x25) + all 16 digest-pinned
# rows-only queries = 47 of 50 slots. A green CORRECTNESS_r04 on this
# window closes the registry: every registered query then carries a
# driver-confirmed row. Every entry below passed tools/driver_sim.py
# (plain session, sf0.01) before this window was handed to the driver.
PRIORITY: list[str] = [
    # canaries (driver-green in r1/r2/r3 — detect gate drift)
    "a6_q1_pricing_summary",
    "w1_latest_per_group",
    "x2_ngram_jaccard",
    # oracle-backed, no driver row yet (strongest check first)
    "a16_stat_moments",
    "f14_parse_url",
    "j11_asof_forward",
    "s15_orc_roundtrip",
    "s16_csv_roundtrip",
    "s18_schema_evolution",
    "s19_nested_types",
    "s20_compaction",
    "st11_stream_stream_join",
    "st12_stream_tumbling",
    "st13_stream_sliding",
    "st14_stream_session",
    "t8_stemmed_lookup",
    "t10_fuzzy_term",
    "t11_field_scoped_search",
    "u5_bag_set_ops",
    "w10_gap_fill",
    "w11_window_fn_suite",
    "x16_pii_redact",
    "x17_rare_token_filter",
    "x18_triangle_count",
    "x20_rag_chunking",
    "x22_ingest_decontam",
    "x23_winnowing_fingerprint",
    "x24_extract_dispatch",
    "x25_sequence_packing",
    "x6_mp3_meta",
    "x6_mp4_frames",
    # digest-pinned rows-only (weaker driver check: rows + stable digest)
    "a7_approx_count_distinct",
    "a7b_hll_sketch_union",
    "a10b_approx_percentile",
    "s4_binary_ingest",
    "x2_minhash_lsh",
    "x2_simhash",
    "x5_knn_lsh",
    "x5_knn_ivf",
    "x5_knn_ivf_trained",
    "x21_dedup_incremental",
    "x6_jpeg_roundtrip",
    "x6_png_roundtrip",
    "x6_feature_extract",
    "x6_resize_thumbnails",
    "x6_frame_sample",
    "x6_avi_frames",
    # round-4 late additions (registered after the rotation above; slots
    # 48-49 of the 50-window so the registry still closes this round)
    "j12_interval_overlap_join",
    "x26_weighted_sample",
    "x6_g711_roundtrip",
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
