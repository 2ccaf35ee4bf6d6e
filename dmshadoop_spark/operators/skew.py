"""Skew-mitigation operators: salted aggregation and salted join.

AQE's skew-join splitting (on by default, session.py) handles most skew at
runtime by subdividing oversized shuffle partitions. These helpers cover
the two cases AQE cannot:

  * a hot GROUP BY key whose single hash-aggregate bucket overwhelms one
    task (AQE only splits *join* partitions) — ``salted_agg`` runs a
    two-level aggregate: partial over (key, salt), final over key. Legal
    for any algebraic aggregate (sum/count/min/max — and avg as
    sum+count);
  * a join against a side with a handful of known-degenerate hot keys
    (null floods, default values) — ``salted_join`` replicates the small
    side per salt so the hot key's rows spread over N tasks.

No reference counterpart (the reference has no joins or aggregates at
all); required by the north star's 100 TB posture (BASELINE.json,
SCALE.md "Joins").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-level aggregation for skewed group keys.

    Level 1 groups by (keys..., salt) with ``partial_aggs``; level 2
    re-aggregates by keys with ``final_aggs`` over the aliased partials.
    The caller states both levels explicitly because only they know the
    re-aggregation law (sum→sum, count→sum, min→min, avg→sum/sum):

        salted_agg(df, ["k"],
                   [F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n")],
                   [F.sum("sx").alias("sx"), F.sum("n").alias("n")])

    The salt is ``spark_partition_id() % salt_buckets`` — deterministic
    within a scan, uniform across input partitions, and free (no hash of
    row content needed: rows of one hot key are already spread across
    input partitions; the salt just stops the shuffle from re-uniting
    them before a partial pass).
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("_salt")
    return (
        df.groupBy(*keys, salt)
        .agg(*partial_aggs)
        .groupBy(*keys)
        .agg(*final_aggs)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys: salt the big side
    with a uniform random-free bucket (hash of all columns → stable,
    deterministic) and replicate ``small`` once per bucket, so one hot
    key's probe rows land on ``salt_buckets`` tasks instead of one.

    Cost: the small side shuffles ``salt_buckets`` × its size — only use
    when `small` is modest and AQE's runtime splitting is unavailable
    (e.g. the skew is in an aggregate feeding the join, or the join is
    forced sort-merge). Supports inner/left joins (semantics preserved:
    every big row keeps exactly its original matches).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(salt_buckets)])
    ).alias("_salt")
    small_rep = small.select("*", salts)
    joined = big_salted.join(small_rep, [*on, "_salt"], how)
    return joined.drop("_salt")
