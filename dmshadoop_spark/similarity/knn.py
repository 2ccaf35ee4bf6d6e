"""Approximate-nearest-neighbor search over embedding columns
(SURVEY.md §2.12 X4/X5).

Two strategies:
  * brute_force_knn — broadcast the query set, score every corpus vector
    with the exact-fold cosine (functions.vectors). The correctness
    baseline; one corpus scan per query batch. At 100 TB this is the
    right plan when the query set is small (it is one broadcast + one
    projection — no shuffle of the corpus at all).
  * lsh_knn — random-hyperplane (signed random projection) LSH: bucket
    vectors by the sign pattern of `planes` fixed hyperplanes, equi-join
    queries to candidates sharing a bucket, exact-rerank only candidates.
    Hyperplanes are generated from a seeded NumPy RNG on the driver and
    broadcast as literals — fully deterministic, no fitting step.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dmshadoop_spark.functions.vectors import as_double, cosine, dot


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q_emb",
    k: int = 10,
) -> DataFrame:
    """(query_id, neighbor_id, cosine) — exact top-k per query."""
    scored = corpus.crossJoin(broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(as_double(query_vec_col), as_double(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _bucket_expr(vec_col: str, planes: np.ndarray):
    """Sign-pattern bucket id: bit i = (v · plane_i) >= 0."""
    bits = []
    for i, plane in enumerate(planes):
        plane_lit = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(dot(as_double(vec_col), plane_lit) >= 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q_emb",
    k: int = 10,
    planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    With p planes the corpus splits into 2^p buckets; expected candidate
    set is |corpus| / 2^p per query — the 100 TB scale path (the bucket id
    is a shuffle-friendly join key; recall tunes with p and multi-probe).
    """
    rng = np.random.RandomState(seed)
    hyperplanes = rng.randn(planes, dim)

    c_bucketed = corpus.withColumn("bucket", _bucket_expr(vec_col, hyperplanes))
    q_bucketed = queries.withColumn(
        "bucket", _bucket_expr(query_vec_col, hyperplanes)
    )
    cand = c_bucketed.join(broadcast(q_bucketed), "bucket").select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(as_double(query_vec_col), as_double(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
