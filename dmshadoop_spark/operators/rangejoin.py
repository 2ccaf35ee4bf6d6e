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
