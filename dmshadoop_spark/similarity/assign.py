"""Centroid-cell assignment for the IVF family — one semantics, two
physical strategies picked by centroid count (round-3 VERDICT item 2).

* ``k <= LITERAL_MAX_CENTROIDS`` — centroids ride the plan as array
  literals; distance fold + argmin run inside whole-stage codegen, zero
  Python. The right shape for small quantizers: no Arrow hop, no
  broadcast bookkeeping.
* ``k > LITERAL_MAX_CENTROIDS`` — a production cell count (k ≈ √n:
  4k-64k cells × 768 dims) embedded as literals builds an O(k·dim)
  expression tree, and Catalyst plan size / codegen explode long before
  the data does. Instead the (k, dim) float64 matrix ships ONCE per
  executor as a SparkContext broadcast, and an Arrow-batched pandas_udf
  computes all row→centroid distances with one fixed-order einsum
  (``d² = ‖x‖² − 2·X·Cᵀ + ‖c‖²``) — O(1) plan size, vectorized math,
  and the only Python-boundary traffic is the vector column itself.

Tie-breaking matches between the paths: nearest-cell takes the FIRST
minimal cell (``array_position`` of the min / first-occurrence argmin),
probe ranking orders by (distance, cell) ascending (struct sort / stable
argsort). Cells are 1-based BIGINT in both.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LITERAL_MAX_CENTROIDS = 256

# cap the (rows × k) distance-matrix intermediate per Arrow batch slice
_MAX_DIST_CELLS = 4_000_000


def _lits(cents: np.ndarray) -> list[Column]:
    return [F.array(*[F.lit(float(x)) for x in row]) for row in cents]


def _dist_arr(v: Column, cents: np.ndarray) -> Column:
    """Literal-path array of squared L2 distances to each centroid."""

    def l2sq(cent):
        return F.aggregate(
            F.zip_with(v, cent, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.array(*[l2sq(c) for c in _lits(cents)])


def _dist_chunks(
    vecs: pd.Series, cents: np.ndarray
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (row_offset, (rows, k) squared-distance block) per bounded
    slice of the batch, via the matmul identity — never materializes the
    (rows, k, dim) cube."""
    k = len(cents)
    c_sq = (cents * cents).sum(axis=1)  # (k,)
    step = max(1, _MAX_DIST_CELLS // k)
    for lo in range(0, len(vecs), step):
        x = np.array(
            vecs.iloc[lo : lo + step].tolist(), dtype=np.float64
        )  # (rows, dim)
        # einsum optimize=False instead of `x @ cents.T`: BLAS GEMM's
        # float summation order follows the runtime thread count, and a
        # last-bit distance drift can flip a boundary argmin — the same
        # bistability class as the round-7 JPEG einsum fix. numpy's own
        # fixed-order loop is bit-identical in every environment.
        xc = np.einsum("nd,kd->nk", x, cents, optimize=False)
        d2 = (x * x).sum(axis=1)[:, None] - 2.0 * xc + c_sq[None, :]
        yield lo, d2


def with_nearest_cell(
    df: DataFrame,
    vec_col: str,
    cents: np.ndarray,
    out_col: str = "cell",
    vectorized: bool | None = None,
) -> DataFrame:
    """Append the 1-based id of the nearest centroid (first-min tie-break).

    ``vectorized`` overrides the k-threshold path pick: the literal
    path's zip_with/aggregate HOFs are CodegenFallback — INTERPRETED,
    boxed-double evaluation — so its per-row cost is k·dim interpreted
    ops; fine at k ≤ ~32, it dominates the wall clock by k ≈ 100 (the
    round-9 semdedup auto-k probe measured it). The einsum path is one
    vectorized contraction per Arrow batch, O(1) plan size. The two
    paths' float arithmetic differs (fold order vs matmul identity), so
    a near-tie argmin can land differently — callers with PINNED outputs
    must not flip paths (the default keeps today's threshold pick);
    callers that OWN their operating point (semdedup k="auto") opt in."""
    use_literal = (
        len(cents) <= LITERAL_MAX_CENTROIDS
        if vectorized is None
        else not vectorized
    )
    if use_literal:
        staged = df.withColumn("_d", _dist_arr(F.col(vec_col), cents))
        return staged.withColumn(
            out_col,
            F.array_position(F.col("_d"), F.array_min(F.col("_d"))),
        ).drop("_d")

    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast(
        np.ascontiguousarray(cents, dtype=np.float64)
    )

    @F.pandas_udf("long")
    def nearest(v: pd.Series) -> pd.Series:
        out = np.empty(len(v), dtype=np.int64)
        for lo, d2 in _dist_chunks(v, bc.value):
            out[lo : lo + d2.shape[0]] = d2.argmin(axis=1) + 1
        return pd.Series(out)

    return df.withColumn(out_col, nearest(F.col(vec_col)))


def with_probe_cells(
    df: DataFrame,
    vec_col: str,
    cents: np.ndarray,
    nprobe: int,
    out_col: str = "cells",
) -> DataFrame:
    """Append the array of the ``nprobe`` nearest cell ids, ranked by
    (distance, cell) ascending."""
    if len(cents) <= LITERAL_MAX_CENTROIDS:
        ranked = F.array_sort(
            F.zip_with(
                _dist_arr(F.col(vec_col), cents),
                F.sequence(F.lit(1), F.lit(len(cents))),
                lambda d, i: F.struct(d.alias("d"), i.cast("long").alias("cell")),
            )
        )
        return df.withColumn(
            out_col,
            F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cell"]),
        )

    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast(
        np.ascontiguousarray(cents, dtype=np.float64)
    )
    n_take = nprobe

    @F.pandas_udf("array<long>")
    def probes(v: pd.Series) -> pd.Series:
        chunks = []
        for _lo, d2 in _dist_chunks(v, bc.value):
            # stable sort keeps index order on distance ties → same
            # (d, cell)-ascending ranking as the literal struct sort
            top = np.argsort(d2, axis=1, kind="stable")[:, :n_take] + 1
            chunks.append(top)
        stacked = np.vstack(chunks) if chunks else np.empty((0, n_take), int)
        return pd.Series(list(stacked))

    return df.withColumn(out_col, probes(F.col(vec_col)))
