"""Generic Hamming-banded candidate pairing over 64-bit fingerprints.

The pigeonhole construction shared by SimHash text dedup and perceptual
image-hash dedup: split the 64 bits into ``chunks`` equal slices; two
fingerprints within Hamming distance ``chunks−1`` must agree on at least
one slice, so an equi-join on (chunk_idx, chunk_val) finds every such
pair with ONE uniform shuffle — no corpus self-join. Pairs are emitted
upper-triangle from each bucket's sorted posting list JVM-side and
deduped; ``max_bucket`` caps degenerate buckets (the 100 TB skew guard,
same policy as minhash_lsh_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hamming_candidate_pairs(
    fps: DataFrame,
    id_col: str,
    fp_col: str,
    chunks: int = 4,
    max_bucket: int = 100_000,
) -> DataFrame:
    """(id_a, id_b, hamming) for fingerprint pairs sharing ≥1 of
    ``chunks`` exact 64/chunks-bit slices (catches ALL pairs with
    hamming ≤ chunks−1; wider pairs appear only if they happen to agree
    on a slice)."""
    width = 64 // chunks
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_idx"),
                # Mask, not %: Spark's % is Java-signed, so chunk 0 of a
                # negative fingerprint (sign bit set — ~half of dhash/
                # ahash values) came out negative and missed its bucket,
                # breaking the "catches ALL pairs ≤ chunks−1" guarantee
                # (round-4 ADVICE). bitwiseAND is sign-oblivious.
                (
                    F.shiftrightunsigned(F.col(fp_col), i * width).bitwiseAND(
                        F.lit((1 << width) - 1).cast("long")
                    )
                ).alias("chunk_val"),
            )
            for i in range(chunks)
        ]
    )
    chunked = fps.select(
        F.struct(id_col, fp_col).alias("d"),
        F.explode(chunk_structs).alias("c"),
    ).select("d", "c.chunk_idx", "c.chunk_val")

    ids = F.array_sort(F.collect_list("d")).alias("ids")
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    cand = (
        chunked.groupBy("chunk_idx", "chunk_val")
        .agg(ids)
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
        .select(F.explode_outer(pair_structs).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(
            F.col(f"p.a.{id_col}").alias(f"{id_col}_a"),
            F.col(f"p.b.{id_col}").alias(f"{id_col}_b"),
            F.col(f"p.a.{fp_col}").alias("_fp_a"),
            F.col(f"p.b.{fp_col}").alias("_fp_b"),
        )
        .distinct()
    )
    return cand.select(
        f"{id_col}_a",
        f"{id_col}_b",
        F.bit_count(F.col("_fp_a").bitwiseXOR(F.col("_fp_b"))).alias("hamming"),
    )
