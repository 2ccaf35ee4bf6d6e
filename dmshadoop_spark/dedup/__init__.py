"""Near-duplicate detection (SURVEY.md §2.12 X2) — MinHash+LSH, SimHash,
and exact n-gram Jaccard (the latter registered with a SQL oracle in
queries/llm.py). All implementations are deterministic (seeded hash
families, no RNG at execution time) and expression-only (JVM-side, no
Python UDFs in the hot path)."""

from dmshadoop_spark.dedup.audiohash import (
    audio_essence_df,
    audio_exact_dedup_pairs,
    audio_fingerprint_int,
    audio_hash_df,
    audio_neardup_pairs,
)
from dmshadoop_spark.dedup.hamming import hamming_candidate_pairs
from dmshadoop_spark.dedup.imagehash import (
    ahash_int,
    dhash_int,
    image_hash_df,
    image_neardup_pairs,
)
from dmshadoop_spark.dedup.components import connected_components, dedup_survivors
from dmshadoop_spark.dedup.semdedup import (
    auto_k,
    blocked_cosine_pairs,
    semdedup,
    semdedup_ingest,
)
from dmshadoop_spark.dedup.minhash import (
    minhash_incremental_pairs,
    minhash_index,
    minhash_lsh_pairs,
    minhash_signature,
)
from dmshadoop_spark.dedup.simhash import simhash, simhash_candidate_pairs, simhash_df, token_hashes
from dmshadoop_spark.dedup.substring import (
    build_occurrence_index,
    compact_index,
    read_occurrence_index,
    substring_decontaminate,
    substring_dedup,
    substring_dedup_fixpoint,
    substring_ingest,
    vacuum_index,
)

__all__ = [
    "ahash_int",
    "audio_essence_df",
    "audio_exact_dedup_pairs",
    "audio_fingerprint_int",
    "audio_hash_df",
    "audio_neardup_pairs",
    "blocked_cosine_pairs",
    "connected_components",
    "build_occurrence_index",
    "compact_index",
    "read_occurrence_index",
    "substring_decontaminate",
    "substring_dedup",
    "substring_dedup_fixpoint",
    "substring_ingest",
    "vacuum_index",
    "dhash_int",
    "hamming_candidate_pairs",
    "image_hash_df",
    "image_neardup_pairs",
    "dedup_survivors",
    "auto_k",
    "semdedup",
    "semdedup_ingest",
    "minhash_incremental_pairs",
    "minhash_index",
    "minhash_lsh_pairs",
    "minhash_signature",
    "simhash",
    "simhash_df",
    "token_hashes",
    "simhash_candidate_pairs",
]
