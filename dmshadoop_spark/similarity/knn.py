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

from dmshadoop_spark.catalog import widen
from dmshadoop_spark.functions.vectors import as_double, dot, norm_sq


def _rank_topk(
    scored: DataFrame, query_id_col: str, k: int, local_prune: bool = True
) -> DataFrame:
    """Exact per-query top-k over (query_id, neighbor_id, cosine): an
    optional local-then-merge prune (similarity/topk.py) caps what the
    ranking exchange carries at k·partitions·|queries| rows — without it
    the window shuffles EVERY scored candidate — then one deterministic
    row_number window (cosine desc, neighbor_id asc) picks the final
    rows. Results are identical either way (the prune yields a superset)."""
    if local_prune:
        from dmshadoop_spark.similarity.topk import local_topk

        scored = local_topk(scored, [query_id_col], "cosine", "neighbor_id", k)
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q_emb",
    k: int = 10,
) -> DataFrame:
    """(query_id, neighbor_id, cosine) — exact top-k per query.

    Both sides stage the double-cast and the L2 norm in materialized
    columns (one computation each, vs re-deriving them inside every
    pairwise cosine), so the per-pair work is exactly one zip_with dot
    fold."""
    corpus2 = (
        widen(corpus)
        .select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_v"))
        .select("neighbor_id", "_v", F.sqrt(norm_sq(F.col("_v"))).alias("_nv"))
    )
    queries2 = (
        queries.select(F.col(query_id_col), as_double(query_vec_col).alias("_qv"))
        .select(query_id_col, "_qv", F.sqrt(norm_sq(F.col("_qv"))).alias("_nq"))
    )
    scored = corpus2.crossJoin(broadcast(queries2)).select(
        F.col(query_id_col),
        "neighbor_id",
        (dot(F.col("_qv"), F.col("_v")) / (F.col("_nq") * F.col("_nv"))).alias(
            "cosine"
        ),
    )
    return _rank_topk(scored, query_id_col, k)


def _sql_dot(vec_col: str, row) -> str:
    """SQL text of the repo's left-fold dot product against a literal
    vector (functions/vectors.dot's exact tree — one expr() py4j call
    instead of one per element; see functions/sqllit.py)."""
    from dmshadoop_spark.functions.sqllit import sql_double_array

    return (
        f"aggregate(zip_with(`{vec_col}`,{sql_double_array(row)},"
        f"(x,y)->x*y),0.0D,(acc,x)->acc+x)"
    )


def _bucket_expr(vec_col: str, planes: np.ndarray):
    """Sign-pattern bucket id over a **materialized** double-array column
    (by NAME): bit i = (v · plane_i) >= 0. Rendered as one SQL string —
    the per-element F.lit form cost planes×dim py4j round trips per
    call. Same fold, same comparisons, bit-identical buckets."""
    terms = " + ".join(
        f"(CASE WHEN ({_sql_dot(vec_col, plane)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    return F.expr(f"CAST({terms} AS BIGINT)")


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
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share one of the query's probed
    hyperplane buckets.

    With p planes the corpus splits into 2^p buckets; expected candidate
    set is |corpus| · nprobe / 2^p per query — the 100 TB scale path (the
    bucket id is a shuffle-friendly join key). ``nprobe`` > 1 enables
    MULTI-PROBE: the query additionally probes the buckets at Hamming
    distance 1 whose separating hyperplane margin |v·plane| is smallest —
    the near-boundary bit flips most likely to hide true neighbors
    (Lv et al., VLDB'07). Recall rises without re-bucketing the corpus
    or doubling planes; the corpus side is untouched, only the broadcast
    query side fans out nprobe×."""
    rng = np.random.RandomState(seed)
    hyperplanes = rng.randn(planes, dim)

    c_bucketed = (
        widen(corpus)
        .select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_v"))
        .select(
            "neighbor_id",
            "_v",
            F.sqrt(norm_sq(F.col("_v"))).alias("_nv"),
            _bucket_expr("_v", hyperplanes).alias("bucket"),
        )
    )
    q_base = queries.select(
        F.col(query_id_col), as_double(query_vec_col).alias("_qv")
    ).select(
        query_id_col,
        "_qv",
        F.sqrt(norm_sq(F.col("_qv"))).alias("_nq"),
        _bucket_expr("_qv", hyperplanes).alias("bucket"),
    )
    if nprobe > 1:
        # margins: |v·plane_i| per plane, ranked ascending — flipping the
        # lowest-margin bit probes the most plausible neighboring bucket
        margins = F.expr(
            "array("
            + ",".join(
                f"named_struct('m',abs({_sql_dot('_qv', plane)}),"
                f"'bit',CAST({1 << i} AS BIGINT))"
                for i, plane in enumerate(hyperplanes)
            )
            + ")"
        )
        flips = F.slice(
            F.transform(F.array_sort(margins), lambda s: s["bit"]),
            1,
            min(nprobe - 1, len(hyperplanes)),
        )
        probes = F.array_union(
            F.array(F.col("bucket")),
            F.transform(
                flips, lambda b: F.col("bucket").bitwiseXOR(b).cast("long")
            ),
        )
        q_base = q_base.withColumn("bucket", F.explode(probes))
    cand = c_bucketed.join(broadcast(q_base), "bucket").select(
        F.col(query_id_col),
        "neighbor_id",
        (dot(F.col("_qv"), F.col("_v")) / (F.col("_nq") * F.col("_nv"))).alias(
            "cosine"
        ),
    )
    return _rank_topk(cand, query_id_col, k)


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q_emb",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    train_iters: int = 0,
    coarse_index_assign: bool = False,
    coarse_index_nprobe: int = 8,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into `n_centroids` cells,
    probe each query's `nprobe` nearest cells, exact-rerank candidates.

    With ``train_iters=0`` centroids are a deterministic hash-ordered
    sample of corpus vectors (the no-training coarse quantizer);
    ``train_iters>0`` refines that same init with distributed Lloyd
    iterations (similarity/kmeans.py) for balanced cells and better probe
    recall. The assignment stage (argmin over centroid distances, per-row
    constant work) is delegated to similarity/assign.py, which embeds the
    centroids as plan literals only up to LITERAL_MAX_CENTROIDS and
    switches to a broadcast-numpy pandas_udf (one fixed-order einsum per Arrow
    batch) above it — a production cell count must not build an O(k·dim)
    Catalyst expression tree (round-3 VERDICT). Expected candidates per
    query: |corpus| * nprobe / n_centroids; the cell id is the only join
    key, so the corpus never shuffles on anything wider than one int.

    ``coarse_index_assign`` (opt-in; False is today's pinned behavior)
    routes the INDEX-side corpus→cell assignment through the two-level
    coarse-to-fine search (assign.with_nearest_cell_coarse, probing
    ``coarse_index_nprobe`` of the ~√n_centroids coarse cells) — the
    scale path when the cell count is itself production-sized (n=10⁹ at
    the √n rule ⇒ 32k-64k cells, where exact assignment is an O(n·k·d)
    index-build pass; the faiss analogue is the HNSW coarse quantizer).
    Approximate: a corpus vector near a cell boundary may be filed in a
    probed-set-local nearest cell — queries that probe THAT cell still
    find it, so the recall perturbation is bounded by the same boundary
    geometry the probe trade already accepts. At
    ``coarse_index_nprobe ≥ √n_centroids`` assignment is bit-identical
    to the exact path (pytest-pinned); never flip it under pinned
    outputs.
    """
    from dmshadoop_spark.similarity.assign import (
        with_nearest_cell,
        with_nearest_cell_coarse,
        with_probe_cells,
    )

    corpus2 = (
        widen(corpus)
        .select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_v"))
        .select("neighbor_id", "_v", F.sqrt(norm_sq(F.col("_v"))).alias("_nv"))
    )
    if train_iters > 0:
        from dmshadoop_spark.similarity.kmeans import kmeans_centroids

        cents_np = kmeans_centroids(
            corpus2,
            vec_col="_v",
            k=n_centroids,
            n_iter=train_iters,
            seed=seed,
            id_col="neighbor_id",
        )
    else:
        # Deterministic centroid sample: order by seeded hash of the id.
        cents = (
            corpus2.select("neighbor_id", "_v")
            .orderBy(
                F.xxhash64(F.col("neighbor_id"), F.lit(seed)).asc(),
                F.col("neighbor_id").asc(),
            )
            .limit(n_centroids)
            .collect()
        )
        cents_np = np.array([row["_v"] for row in cents], dtype=np.float64)

    if coarse_index_assign:
        c_cells = with_nearest_cell_coarse(
            corpus2, "_v", cents_np, nprobe=coarse_index_nprobe,
            out_col="cell",
        )
    else:
        c_cells = with_nearest_cell(corpus2, "_v", cents_np, out_col="cell")
    q_staged = queries.select(
        F.col(query_id_col), as_double(query_vec_col).alias("_qv")
    ).select(query_id_col, "_qv", F.sqrt(norm_sq(F.col("_qv"))).alias("_nq"))
    q_probed = with_probe_cells(
        q_staged, "_qv", cents_np, nprobe, out_col="_cells"
    ).select(
        query_id_col, "_qv", "_nq", F.explode("_cells").alias("cell")
    )
    cand = c_cells.join(broadcast(q_probed), "cell").select(
        F.col(query_id_col),
        "neighbor_id",
        (dot(F.col("_qv"), F.col("_v")) / (F.col("_nq") * F.col("_nv"))).alias(
            "cosine"
        ),
    )
    return _rank_topk(cand, query_id_col, k)
