"""Binned range join — large×large interval joins as one equi shuffle.

``j6_range_join`` covers the broadcastable case (a handful of brackets);
this operator covers the case the reference never had and Spark itself
lacks a physical strategy for: BOTH sides scale with the data, so the
planner's only native option is a broadcast-nested-loop (O(n·m) and an
executor-memory bomb at 100 TB).

The standard fix (Databricks' range-join optimization, DuckDB's IEJoin
literature) is binning: quantize the domain into fixed-width bins, give
every point its single bin id, replicate every interval over each bin it
overlaps, equi-join on the bin id, then apply the exact predicate as a
residual filter. Cost model:

  * one shuffle per side on ``__bin`` — uniform when intervals are short
    relative to the domain spread;
  * replication factor = avg(interval span / bin_width) + 1 — the single
    tuning knob; choose ``bin_width`` near the typical interval length so
    the factor stays ~2;
  * no dedup needed: a point has exactly ONE bin, so each qualifying
    (point, interval) pair meets exactly once.

Boundary safety needs no epsilon care: ``floor(x / w)`` is monotone
non-decreasing in IEEE double (division is correctly rounded), so
``lo <= p <= hi`` always implies ``bin(lo) <= bin(p) <= bin(hi)`` — a
qualifying pair can never land in non-matching bins; false bin matches
are removed by the residual predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PT, _IV = "__rj_pt", "__rj_iv"


def _closed_pred(point: Column, lo: Column, hi: Column, closed: str) -> Column:
    if closed == "left":
        return (point >= lo) & (point < hi)
    if closed == "right":
        return (point > lo) & (point <= hi)
    if closed == "both":
        return (point >= lo) & (point <= hi)
    raise ValueError(f"closed must be left|right|both, got {closed!r}")


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_on: str,
    lower: str,
    upper: str,
    bin_width: float,
    closed: str = "left",
) -> DataFrame:
    """Inner-join ``points`` to every interval containing ``point_on``.

    ``points[point_on]``, ``intervals[lower]``, ``intervals[upper]`` are
    numeric columns. ``closed`` picks the boundary convention ([lo, hi)
    by default). Column names must not collide between the two inputs
    (same contract as ``asof_join``). Returns points⨝intervals columns,
    bin bookkeeping dropped.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = F.lit(float(bin_width))
    pt = points.withColumn(
        "__bin", F.floor(F.col(point_on) / w).cast("long")
    ).alias(_PT)
    # Degenerate (empty) intervals emit no bins; sequence() is inclusive on
    # both ends so an interval always covers the bins of both endpoints.
    iv = (
        intervals.filter(F.col(upper) >= F.col(lower))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lower) / w).cast("long"),
                    F.floor(F.col(upper) / w).cast("long"),
                )
            ),
        )
        .alias(_IV)
    )
    residual = _closed_pred(
        F.col(f"{_PT}.{point_on}"), F.col(f"{_IV}.{lower}"), F.col(f"{_IV}.{upper}"), closed
    )
    joined = pt.join(
        iv, (F.col(f"{_PT}.__bin") == F.col(f"{_IV}.__bin")) & residual, "inner"
    )
    return joined.select(
        *[F.col(f"{_PT}.{c}") for c in points.columns],
        *[F.col(f"{_IV}.{c}") for c in intervals.columns],
    )


def binned_interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lower: str,
    left_upper: str,
    right_lower: str,
    right_upper: str,
    bin_width: float,
    closed: str = "both",
) -> DataFrame:
    """Inner-join ``left`` to every ``right`` interval it OVERLAPS — the
    interval×interval companion to ``binned_range_join`` (time-range
    conflicts, reservation collisions, span intersection), and like it a
    shape Spark's planner can only express as a nested-loop.

    Same binning discipline, one extra idea: an interval covers MANY bins
    (unlike a point), so a naive bin equi-join would emit a qualifying
    pair once per shared bin. Instead each pair is claimed by exactly ONE
    owner bin — the bin of the overlap's left edge, max(a.lo, b.lo),
    which every overlapping pair has and which lies inside both
    intervals' bin ranges — so emission is exactly-once WITHOUT a
    distinct/dedup shuffle. Cost: one shuffle per side on the bin id,
    replication = span/bin_width + 1 per row, residual predicate exact.

    ``closed="both"`` treats intervals as closed ([lo,hi] overlap iff
    a.lo <= b.hi AND b.lo <= a.hi); ``closed="left"`` as half-open
    [lo,hi). Column names must not collide between the inputs.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = F.lit(float(bin_width))

    def binned(df: DataFrame, lo: str, hi: str, alias: str) -> DataFrame:
        return (
            df.filter(F.col(hi) >= F.col(lo))
            .withColumn(
                "__bin",
                F.explode(
                    F.sequence(
                        F.floor(F.col(lo) / w).cast("long"),
                        F.floor(F.col(hi) / w).cast("long"),
                    )
                ),
            )
            .alias(alias)
        )

    a = binned(left, left_lower, left_upper, _PT)
    b = binned(right, right_lower, right_upper, _IV)
    a_lo, a_hi = F.col(f"{_PT}.{left_lower}"), F.col(f"{_PT}.{left_upper}")
    b_lo, b_hi = F.col(f"{_IV}.{right_lower}"), F.col(f"{_IV}.{right_upper}")
    if closed == "both":
        overlap = (a_lo <= b_hi) & (b_lo <= a_hi)
    elif closed == "left":
        overlap = (a_lo < b_hi) & (b_lo < a_hi)
    else:
        raise ValueError(f"closed must be both|left, got {closed!r}")
    owner = F.floor(F.greatest(a_lo, b_lo) / w).cast("long")
    joined = a.join(
        b,
        (F.col(f"{_PT}.__bin") == F.col(f"{_IV}.__bin"))
        & (F.col(f"{_PT}.__bin") == owner)
        & overlap,
        "inner",
    )
    return joined.select(
        *[F.col(f"{_PT}.{c}") for c in left.columns],
        *[F.col(f"{_IV}.{c}") for c in right.columns],
    )
