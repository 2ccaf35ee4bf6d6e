"""Distributed Lloyd's k-means — centroid training for the IVF quantizer.

``ivf_knn`` ships with a no-training coarse quantizer (a deterministic
hash-ordered sample). Real IVF indexes train centroids so cells are
balanced and probe recall is higher; this module is that training step,
expressed as the standard Spark iteration shape (the same one MLlib's
KMeans uses underneath):

  * ASSIGN — each vector's distances to all k centroids are staged as
    one array column (centroids ride the plan as literals — k×dim
    doubles, broadcast-sized), argmin picks the cell. Scan-local, no
    shuffle.
  * UPDATE — element-wise mean per cell via ``posexplode`` →
    groupBy(cell, pos). The partial aggregate combines map-side, so the
    exchange carries ≤ k×dim×partitions rows regardless of corpus size;
    the k×dim result (a few KB) is collected to the driver to become the
    next round's literals. Driver state is centroids only — never data.

Iterations are bounded (``n_iter``) with early exit when no assignment
changes the mean (cost is non-increasing — Lloyd's invariant). All
randomness is a seeded hash order, so training is deterministic and
retrainable to identical results on any cluster size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dmshadoop_spark.functions.vectors import as_double


def _dist_arr(v, cent_lits):
    """Array of squared L2 distances from ``v`` to each centroid literal."""

    def l2sq(cent):
        return F.aggregate(
            F.zip_with(v, cent, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.array(*[l2sq(c) for c in cent_lits])


def _lits(cents: np.ndarray):
    return [F.array(*[F.lit(float(x)) for x in row]) for row in cents]


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    n_iter: int = 5,
    seed: int = 42,
    id_col: str | None = None,
) -> np.ndarray:
    """Train k centroids over ``df[vec_col]``; returns a (k, dim) array.

    Init = deterministic hash-ordered sample (matches ivf_knn's untrained
    quantizer, so ``n_iter=0`` reproduces it exactly)."""
    order = (
        [F.xxhash64(F.col(id_col), F.lit(seed)).asc(), F.col(id_col).asc()]
        if id_col
        else [F.xxhash64(F.to_json(F.col("_v")), F.lit(seed)).asc()]
    )
    vecs = df.select(
        *( [F.col(id_col)] if id_col else [] ), as_double(vec_col).alias("_v")
    )
    init_rows = vecs.orderBy(*order).limit(k).collect()
    cents = np.array([row["_v"] for row in init_rows], dtype=np.float64)
    for _ in range(n_iter):
        staged = vecs.select(
            "_v", _dist_arr(F.col("_v"), _lits(cents)).alias("_d")
        ).select(
            "_v",
            F.array_position(F.col("_d"), F.array_min(F.col("_d"))).alias("cell"),
        )
        sums = (
            staged.select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_cents = cents.copy()  # empty cells keep their old centroid
        for row in sums:
            new_cents[row["cell"] - 1, row["pos"]] = row["s"] / row["n"]
        if np.array_equal(new_cents, cents):
            break
        cents = new_cents
    return cents
