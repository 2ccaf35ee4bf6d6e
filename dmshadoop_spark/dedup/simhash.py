"""SimHash near-dup detection, expression-only (SURVEY.md §2.12 X2).

64-bit SimHash: each token votes its xxhash64 bit pattern (+1 for set bits,
-1 for clear); the sign of each bit's vote total forms the fingerprint.
Near-dups differ in few bits (small Hamming distance). Candidate pairing
uses the pigeonhole trick: split the 64 bits into k chunks; two fingerprints
within Hamming distance k-1 must share at least one exact chunk, so an
equi-join on (chunk_idx, chunk_value) finds all candidates with one shuffle
— no pairwise comparison of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dmshadoop_spark.catalog import widen
from dmshadoop_spark.functions.text import tokenize


def token_hashes(tokens_col: Column | str, seed: int = 42) -> Column:
    """array<bigint> of per-token xxhash64 values — materialize this with a
    ``select`` before folding bits (see the shingles() performance contract
    in functions.text: the 64 bit-folds each re-reference the array)."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.transform(c, lambda t: F.xxhash64(t, F.lit(seed)))


def simhash(hashes_col: Column | str) -> Column:
    """64-bit SimHash as BIGINT from a **materialized** token-hash array
    (token_hashes). Bit votes folded per position."""
    hashes = F.col(hashes_col) if isinstance(hashes_col, str) else hashes_col
    # votes[j] = sum over tokens of (bit_j ? +1 : -1); bit j of the result
    # is set when votes[j] > 0. Bit positions are Python ints (shift
    # builtins take literal bit counts), so this unrolls to 64 independent
    # folds — all inside codegen.
    def vote(j: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftrightunsigned(h, j) % 2) * 2 - 1,
        )

    out = F.lit(0).cast("long")
    for j in range(64):
        weight = F.lit(-9223372036854775808) if j == 63 else F.lit(1 << j).cast("long")
        out = out + F.when(vote(j) > 0, weight).otherwise(F.lit(0).cast("long"))
    return out


def simhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunks: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(doc_a, doc_b, hamming) for pairs sharing ≥1 of `chunks` exact
    chunks (catches all pairs with hamming ≤ chunks-1)."""
    width = 64 // chunks
    base = (
        widen(docs).select(
            F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("toks")
        )
        .select("doc_id", token_hashes("toks", seed).alias("hashes"))
        .select("doc_id", simhash("hashes").alias("sh"))
    )
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_idx"),
                (
                    F.shiftrightunsigned(F.col("sh"), i * width)
                    % F.lit(1 << width).cast("long")
                ).alias("chunk_val"),
            )
            for i in range(chunks)
        ]
    )
    chunked = base.select(
        "doc_id", "sh", F.explode(chunk_structs).alias("c")
    ).select("doc_id", "sh", "c.chunk_idx", "c.chunk_val")

    a = chunked.alias("a")
    b = chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
    )
