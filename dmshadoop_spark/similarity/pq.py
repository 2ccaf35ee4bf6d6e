"""Product quantization (PQ) ANN — the memory-compression scale path.

IVF (knn.py) shrinks the CANDIDATE SET; PQ shrinks the BYTES PER VECTOR:
each embedding is split into ``m`` subvectors and every subvector is
replaced by the id of its nearest centroid in a per-subspace codebook of
``2^nbits`` entries (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 2011). A 64-dim float corpus row
(256 B) becomes ``m`` small ints + one stored norm — at m=8 that is a
~16-32× compression, which is what makes a 100 TB embedding corpus fit
the page cache of a 1000-executor cluster at all.

Search is ADC (asymmetric distance computation): the query stays exact;
per query a lookup table LUT[j][c] = q_subⱼ · codebook[j][c] is built
once (m·2^nbits dots), and scoring a corpus row is then just
``Σⱼ LUT[j][code[j]]`` — m array lookups instead of a dim-length dot.
The scoring expression is pure Spark SQL higher-order functions
(zip_with + element_at + aggregate), so the ADC scan runs inside
whole-stage codegen over the CODES ONLY: full vectors are touched twice
ever — once at encode time, once for the exact rerank of the top
ADC candidates (a broadcast point-lookup join, never a corpus shuffle).

Training reuses the distributed Lloyd iterations of similarity/kmeans.py
per subspace (m bounded jobs, offline); everything downstream is
deterministic: seeded hash-ordered init, first-occurrence argmin,
float64 math, unique-key tie-breaks in the top-k.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dmshadoop_spark.catalog import widen
from dmshadoop_spark.functions.vectors import as_double, dot, norm_sq


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    n_iter: int = 3,
    id_col: str | None = None,
) -> np.ndarray:
    """Train per-subspace codebooks → (m, 2^nbits, dim/m) float64.

    Subspace j is vector positions [j·dsub, (j+1)·dsub); each codebook is
    Lloyd-refined from the same deterministic hash-ordered init the IVF
    quantizer uses (kmeans_centroids, seeded per subspace). ``dim`` must
    divide evenly by ``m`` (standard PQ restriction)."""
    from dmshadoop_spark.similarity.kmeans import kmeans_centroids

    dim = len(
        df.select(as_double(vec_col).alias("_v")).limit(1).collect()[0]["_v"]
    )
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub, ksub = dim // m, 1 << nbits
    books = []
    for j in range(m):
        sub = df.select(
            *([F.col(id_col)] if id_col else []),
            F.slice(as_double(vec_col), j * dsub + 1, dsub).alias("_sub"),
        )
        books.append(
            kmeans_centroids(
                sub,
                vec_col="_sub",
                k=ksub,
                n_iter=n_iter,
                seed=seed + j,
                id_col=id_col,
            )
        )
    return np.stack(books)


def _encode_udf(spark: SparkSession, codebooks: np.ndarray):
    """pandas_udf: vector → array<int> of per-subspace nearest-centroid
    ids. Codebooks ship once per executor as a broadcast; per Arrow batch
    each subspace is one BLAS distance computation + argmin (ties →
    first occurrence, matching assign.py's convention)."""
    bc = spark.sparkContext.broadcast(codebooks)

    @F.pandas_udf("array<int>")
    def encode(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        books = bc.value  # (m, ksub, dsub)
        m, _, dsub = books.shape
        for s in it:
            X = np.array(list(s), dtype=np.float64)  # (n, dim)
            codes = np.empty((X.shape[0], m), dtype=np.int32)
            for j in range(m):
                sub = X[:, j * dsub : (j + 1) * dsub]
                # ‖x−c‖² = ‖x‖² − 2xCᵀ + ‖c‖²; ‖x‖² constant per row →
                # argmin over (−2xCᵀ + ‖c‖²)
                d = -2.0 * sub @ books[j].T + (books[j] ** 2).sum(axis=1)
                codes[:, j] = np.argmin(d, axis=1)
            yield pd.Series(list(codes))

    return encode


def _lut_udf(spark: SparkSession, codebooks: np.ndarray):
    """pandas_udf: query vector → flat ADC lookup table (m·ksub doubles),
    LUT[j·ksub + c] = q_subⱼ · codebook[j][c]."""
    bc = spark.sparkContext.broadcast(codebooks)

    @F.pandas_udf("array<double>")
    def lut(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        books = bc.value
        m, ksub, dsub = books.shape
        for s in it:
            Q = np.array(list(s), dtype=np.float64)
            out = np.empty((Q.shape[0], m * ksub), dtype=np.float64)
            for j in range(m):
                sub = Q[:, j * dsub : (j + 1) * dsub]
                out[:, j * ksub : (j + 1) * ksub] = sub @ books[j].T
            yield pd.Series(list(out))

    return lut


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, pq_code array<int>, pq_norm double) — the compressed index.
    The stored norm is the EXACT vector norm (computed JVM-side), so
    approximate cosines use the true denominator and only the numerator
    is quantized."""
    spark = df.sparkSession
    encode = _encode_udf(spark, codebooks)
    staged = widen(df).select(
        F.col(id_col), as_double(vec_col).alias("_v")
    )
    return staged.select(
        id_col,
        encode(F.col("_v")).alias("pq_code"),
        F.sqrt(norm_sq(F.col("_v"))).alias("pq_norm"),
    )


def _adc_score(ksub: int, m: int):
    """ADC numerator as a codegen'd SQL expression over (pq_code, _lut):
    Σⱼ LUT[j·ksub + code[j]] — zip_with pairs each code with its subspace
    index, element_at reads the flat LUT (1-based)."""
    terms = F.zip_with(
        F.col("pq_code"),
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda c, j: F.element_at(
            F.col("_lut"), (j * ksub + c + 1).cast("int")
        ),
    )
    return F.aggregate(
        terms, F.lit(0.0), lambda acc, x: acc + x
    )


def pq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q_emb",
    k: int = 10,
    m: int = 8,
    nbits: int = 4,
    rerank: int = 4,
    seed: int = 42,
    train_iters: int = 3,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine) — PQ-ADC candidate scan + exact
    rerank of the top ``k·rerank`` per query.

    Plan shape: the ADC stage scans the compressed index (codes + norm,
    never vectors) against a broadcast query-LUT table entirely in
    whole-stage codegen; the rerank stage broadcast-joins the k·rerank
    candidate ids back to the corpus for exact cosines — one extra
    corpus scan, zero corpus shuffles. ``rerank=0`` returns raw ADC
    ranking (approximate cosine) without the second scan."""
    from dmshadoop_spark.similarity.knn import _rank_topk

    spark = corpus.sparkSession
    corpus2 = (
        widen(corpus)
        .select(
            F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_v")
        )
        .select("neighbor_id", "_v", F.sqrt(norm_sq(F.col("_v"))).alias("_nv"))
    )
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus2,
            vec_col="_v",
            m=m,
            nbits=nbits,
            seed=seed,
            n_iter=train_iters,
            id_col="neighbor_id",
        )
    m, ksub, _ = codebooks.shape
    enc = pq_encode(corpus2, codebooks, vec_col="_v", id_col="neighbor_id")

    lut = _lut_udf(spark, codebooks)
    q2 = queries.select(
        F.col(query_id_col), as_double(query_vec_col).alias("_qv")
    ).select(
        query_id_col,
        "_qv",
        F.sqrt(norm_sq(F.col("_qv"))).alias("_nq"),
    )
    q_lut = q2.select(
        query_id_col, "_nq", lut(F.col("_qv")).alias("_lut")
    )

    scored = enc.crossJoin(broadcast(q_lut)).select(
        F.col(query_id_col),
        "neighbor_id",
        (_adc_score(ksub, m) / (F.col("_nq") * F.col("pq_norm"))).alias(
            "cosine"
        ),
    )
    if rerank <= 0:
        return _rank_topk(scored, query_id_col, k)
    cand = _rank_topk(scored, query_id_col, k * rerank).select(
        query_id_col, "neighbor_id"
    )
    exact = (
        corpus2.join(broadcast(cand), "neighbor_id")
        .join(broadcast(q2), query_id_col)
        .select(
            F.col(query_id_col),
            "neighbor_id",
            (
                dot(F.col("_qv"), F.col("_v"))
                / (F.col("_nq") * F.col("_nv"))
            ).alias("cosine"),
        )
    )
    return _rank_topk(exact, query_id_col, k)
