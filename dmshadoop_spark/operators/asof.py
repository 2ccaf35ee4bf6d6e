"""Scalable as-of join (SURVEY.md §2.3 J7 — no reference counterpart).

Spark has no ASOF JOIN operator. The naive encoding (range join + keep
latest) is a BroadcastNestedLoopJoin that explodes at scale. This
implementation uses the *union trick*: tag both inputs, union them, and run a
single `last(value, ignorenulls=True)` window ordered by (ts, seq) within
each key. That is one shuffle on the join key + one partition-local sort —
the same cost profile as a sort-merge join, and it survives 100× scale-up
because no per-row candidate set is ever materialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    seq: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the value columns of the latest right row
    with the same ``on`` key and ``(ts, seq) <= (left.ts, left.seq)``.

    ``seq`` must be a unique-per-(key, ts) tie-break column present in both
    inputs. Left rows keep all their columns; matched value columns are
    suffixed with ``_asof`` (NULL when no right row precedes).
    """
    left_cols = left.columns
    l_tagged = left.select(
        *left_cols, *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols]
    ).withColumn("__side", F.lit(1))
    r_tagged = right.select(
        *[
            F.col(c) if c in (on + [ts, seq]) else F.lit(None).alias(c)
            for c in left_cols
        ],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    ).withColumn("__side", F.lit(0))

    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at identical (ts, seq) — "<=" asof
    # semantics. One shuffle on `on`, one local sort; no candidate blow-up.
    w = (
        Window.partitionBy(*[F.col(c) for c in on])
        .orderBy(F.col(ts), F.col(seq), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        F.col("__side"),
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"{c}_asof")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
