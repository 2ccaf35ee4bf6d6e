"""Distributed triangle enumeration (compact-forward / degree ordering).

The naive 3-way edge self-join enumerates every WEDGE centered on every
vertex — on a graph with a high-degree hub, that's deg² intermediate rows
per hub and the join explodes. The classic fix (Schank/Wagner's
compact-forward, the standard MapReduce/Spark formulation): orient each
undirected edge from its lower-(degree, id) endpoint to the higher one,
build wedges only around each edge's SOURCE, and close them against the
undirected edge set. Every triangle is then found exactly once, and the
per-vertex wedge work is C(out_deg, 2) with out-degree bounded by
O(√m) — hub vertices become wedge *targets*, never wedge centers.

Shuffles: degree count (uniform node key), wedge build (join on the
oriented source), closure (join on the canonical edge key) — all equi
joins on uniform keys; nothing quadratic in any vertex's total degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Enumerate triangles in an undirected simple graph.

    ``edges`` must hold each undirected edge once (any orientation; self
    loops rejected upstream). Returns one row per triangle with columns
    ``x < y < z``.
    """
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
    ).dropDuplicates(["a", "b"])

    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    # Orient a→b when (deg, id) of a is smaller; ties impossible on id.
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ranked = e.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )

    o1 = oriented.select(F.col("u"), F.col("v").alias("v1"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("v2"))
    wedges = o1.join(o2, "u").filter(F.col("v1") < F.col("v2"))

    closed = wedges.join(
        e,
        (F.col("a") == F.least("v1", "v2"))
        & (F.col("b") == F.greatest("v1", "v2")),
    )
    tri = closed.select(
        F.array_sort(F.array("u", "v1", "v2")).alias("t")
    )
    return tri.select(
        F.col("t")[0].alias("x"), F.col("t")[1].alias("y"), F.col("t")[2].alias("z")
    )
