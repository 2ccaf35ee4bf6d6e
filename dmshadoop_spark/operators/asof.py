"""Scalable as-of join (SURVEY.md §2.3 J7 — no reference counterpart).

Spark has no ASOF JOIN operator. The naive encoding (range join + keep
latest) is a BroadcastNestedLoopJoin that explodes at scale. This
implementation uses the *union trick*: tag both inputs, union them, and run
a single `last(..., ignorenulls=True)` window ordered by (ts, seq) within
each key. That is one shuffle on the join key + one partition-local sort —
the same cost profile as a sort-merge join, and it survives 100× scale-up
because no per-row candidate set is ever materialized.

All value columns travel as ONE struct, so every ``_asof`` output column
comes from the SAME latest preceding right row — a right row that updates
one field to NULL propagates that NULL instead of resurrecting an older
non-NULL value (standard ASOF semantics; a per-column ``last`` would mix
fields from different rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    seq: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the value columns of the latest right row
    with the same ``on`` key and ``(ts, seq) <= (left.ts, left.seq)`` —
    or, with ``direction="forward"``, the EARLIEST right row with
    ``(ts, seq) >= (left.ts, left.seq)`` (the "next event after" join:
    next price tick, next purchase, next maintenance window).

    ``seq`` must be a unique-per-(key, ts) tie-break column present in both
    inputs. Left rows keep all their columns; matched value columns are
    suffixed with ``_asof`` (all NULL when no right row precedes/follows).
    All ``_asof`` columns are fields of one struct carried from the single
    matched right row, so they are always mutually consistent. Both
    directions cost the same: one shuffle on ``on`` + one local sort —
    forward just reverses the sort order.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_cols = left.columns
    vstruct = StructType([right.schema[c] for c in value_cols])
    l_tagged = left.select(
        *left_cols,
        F.lit(None).cast(vstruct).alias("__v_all"),
        F.lit(1).alias("__side"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (on + [ts, seq]) else F.lit(None).alias(c)
            for c in left_cols
        ],
        F.struct(*[F.col(c) for c in value_cols]).alias("__v_all"),
        F.lit(0).alias("__side"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at identical (ts, seq) — "<=" asof
    # semantics (forward: sort reversed, so "latest preceding" becomes
    # "earliest following"). One shuffle on `on`, one local sort; no
    # candidate blow-up either way.
    if direction == "backward":
        order = [F.col(ts), F.col(seq), F.col("__side")]
    else:
        order = [F.col(ts).desc(), F.col(seq).desc(), F.col("__side")]
    w = (
        Window.partitionBy(*[F.col(c) for c in on])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        F.col("__side"),
        F.last(F.col("__v_all"), ignorenulls=True).over(w).alias("__latest"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *left_cols,
        *[
            F.col("__latest").getField(c).alias(f"{c}_asof")
            for c in value_cols
        ],
    )
