"""PageRank over document-similarity graphs — iterative numeric fixpoint.

Complements dedup/components.py (label propagation): components answers
"which docs form one cluster"; PageRank answers "which docs are most
central" (e.g. rank canonical survivors, prioritize review queues, weight
boilerplate hubs). Same graph inputs: the near-dup pair emissions.

ENGINE-EXACT INTEGER FORM: ranks live as scaled integers (``scale`` =
1e12 rank units) and every step uses floor division — r0 = scale // N,
r' = (scale·3//20) // N  +  (17 · Σ_{u→v} (r(u) // deg(u))) // 20
(damping 0.85 = 17/20 exactly). Integer sums are order-insensitive, so
the result is bit-identical across engines, partitionings, and row
orders — a float PageRank could never pass a value-hash oracle because
Σ float contributions depends on reduction order.

Scale posture per iteration: one equi join on the uniform node-id key +
one partial-aggregated sum — the canonical distributed PageRank step.
Lineage is truncated each round with ``stabilize`` — reliable
``checkpoint`` when a checkpoint dir is set, ``localCheckpoint``
otherwise (iterative
plans otherwise re-expand the whole upstream pipeline per round — same
discipline as connected_components). Dangling nodes don't arise on
undirected pair graphs (every node keeps out-degree ≥ 1), so no
dangling-mass redistribution term is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dmshadoop_spark.functions.checkpoint import stabilize

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Integer-exact PageRank on the undirected graph of ``edges``.

    Returns (node, rank_int) with rank_int in units of SCALE⁻¹. Both
    directions of each edge are emitted from ONE subtree (explode of a
    2-struct array — a unioned second select would replan the upstream
    pair pipeline twice)."""
    und = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src).alias("u"), F.col(dst).alias("v")
                    ),
                    F.struct(
                        F.col(dst).alias("u"), F.col(src).alias("v")
                    ),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .transform(stabilize)
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    ed = und.join(deg, "u").transform(stabilize)
    ndf = deg.agg(F.count(F.lit(1)).alias("n")).transform(stabilize)
    ranks = (
        deg.crossJoin(broadcast(ndf))
        .select("u", F.expr(f"CAST({SCALE} AS BIGINT) div n").alias("r"))
        .transform(stabilize)
    )
    base_num = SCALE * 3 // 20
    for _ in range(iterations):
        contrib = ed.join(ranks, "u").select(
            F.col("v").alias("u"), F.expr("r div d").alias("c")
        )
        ranks = (
            contrib.groupBy("u")
            .agg(F.sum("c").alias("s"))
            .crossJoin(broadcast(ndf))
            .select(
                "u",
                F.expr(
                    f"CAST({base_num} AS BIGINT) div n + (17 * s) div 20"
                ).alias("r"),
            )
            .transform(stabilize)
        )
    return ranks.select(F.col("u").alias("node"), F.col("r").alias("rank_int"))
