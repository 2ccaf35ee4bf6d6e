"""SemDeDup — semantic deduplication over embeddings (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540).

The published recipe, re-expressed as Spark stages:

  1. CLUSTER   — k-means over the embedding column
     (similarity/kmeans.py: deterministic seeded init, broadcast
     centroids, driver state = k×dim only).
  2. PAIR      — exact pairwise cosine WITHIN each cluster at threshold
     ``eps`` (the paper computes the full intra-cluster similarity
     matrix; here each cluster block is triangle-sharded exactly like
     x2_embedding_neardup so collected arrays stay bounded no matter how
     hot a cluster gets — results identical for any shard count).
  3. GROUP     — connected components over the ≥ eps pairs
     (dedup/components.py: min-label propagation + pointer jumping).
  4. SURVIVOR  — per duplicate group keep the example with the LOWEST
     cosine to its cluster centroid (the paper's rule: low-similarity
     examples are the informative ones), tie-broken by id.

100 TB shape: clustering is the standard bounded-iteration Lloyd loop
(assignment scan-local, update = one partial-agg shuffle of ≤ k×dim rows
per partition); pair emission never crosses clusters, so the worst
exchange is the intra-cluster triangle — sharded and cap-able the same
way the label-blocked near-dup is; components run on pair keys only
(never vectors); the survivor pick is one window over (component).
Everything after training is a declarative plan — no Python in any
per-row loop.

Rows-only by nature (iterative k-means training has no SQL oracle);
determinism is pinned by seeded init + fixed iteration count + explicit
left-fold arithmetic, digest-tested in tests/test_dedup_similarity.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dmshadoop_spark.functions.vectors import as_double, dot, norm_sq


def centroid_frame(
    spark: SparkSession,
    cents: np.ndarray,
    _max_list_elems: int = 2**31 - 1,
) -> DataFrame:
    """(cell, cent array<double>, ncent) frame from a centroid matrix —
    through Arrow, never a Python list-of-lists (round-10, the r9
    verdict's task 4: the old ``[(i+1, [float(x) for x in c], ...)]``
    built k·dim boxed floats on the driver — ~1 GB of PyObjects at
    k=2M, dim=64 — then serialized them through py4j row by row. The
    pyarrow route keeps the matrix as ONE numpy block: the list column
    is built zero-copy from the raveled matrix + an offsets vector, and
    Spark 4 ingests a pyarrow Table natively — independent of the
    session's ``spark.sql.execution.arrow.pyspark.enabled`` setting, so
    this works under the driver's untuned plain session too).
    Value-identical: same cells, same doubles."""
    import pyarrow as pa

    cents64 = np.ascontiguousarray(cents, dtype=np.float64)
    k, dim = cents64.shape
    # pa.ListArray carries int32 offsets, so one array caps at 2^31-1
    # child elements; the advertised large-k path (k=2M, dim≳1100)
    # exceeds that and int32 arange would wrap NEGATIVE silently
    # (round-10 ADVICE). Chunk the list column so every chunk's offset
    # vector stays in int32 range — pa.table accepts a ChunkedArray
    # alongside plain arrays, and Spark's Arrow ingest concatenates
    # chunks; value-identical below the limit (one chunk, same bytes).
    rows_per_chunk = max(1, _max_list_elems // max(dim, 1))
    chunks = []
    for start in range(0, k, rows_per_chunk):
        sub = cents64[start : start + rows_per_chunk]
        offsets = pa.array(
            np.arange(0, (len(sub) + 1) * dim, dim, dtype=np.int64).astype(
                np.int32
            )
        )
        chunks.append(
            pa.ListArray.from_arrays(
                offsets, pa.array(sub.ravel(), type=pa.float64())
            )
        )
    if not chunks:  # k == 0: keep the schema, emit zero rows
        chunks.append(
            pa.ListArray.from_arrays(
                pa.array([0], type=pa.int32()),
                pa.array([], type=pa.float64()),
            )
        )
    tbl = pa.table(
        {
            "cell": pa.array(np.arange(1, k + 1, dtype=np.int64)),
            "cent": pa.chunked_array(chunks),
            "ncent": pa.array(np.sqrt((cents64 * cents64).sum(axis=1))),
        }
    )
    return spark.createDataFrame(
        tbl, "cell long, cent array<double>, ncent double"
    )


def blocked_cosine_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str,
    vec_col: str,
    threshold: float,
    shards: int = 4,
    vectorized: bool = False,
) -> DataFrame:
    """Exact all-pairs cosine ≥ ``threshold`` within each block —
    (block, vec_a, vec_b, cosine), each unordered pair exactly once.

    The triangle-shard pattern (see x2_embedding_neardup's docstring for
    the full argument): each vector hashes to one of ``shards`` shards,
    every unordered shard pair {i, j} (including i == j) is a group, a
    vector in shard s replicates to the ``shards`` groups it can meet a
    partner in, and the A×B product inside a group emits each pair once.
    Exact for ANY shard count; worst-row memory shrinks shards×.

    ``vectorized`` (opt-in; False is the pinned default) computes each
    group's A×B cosine block as ONE numpy contraction inside
    applyInPandas instead of an interpreted zip_with/aggregate fold per
    emitted pair — the same CodegenFallback cliff the assignment path
    documents, paid per PAIR here (the round-9 sf1 stage split measured
    the pair stage at 5.0 s; the fold is ~3·dim boxed ops per pair).
    The (|A|,|B|) float block is bounded by (block/shards)² exactly
    like the collected arrays on the default path. Same exchange (one
    grouped shuffle); cosine float arithmetic differs at the last bits
    (matmul accumulation order vs fold order), so any pair whose cosine
    lies within a few ulps of the threshold — not only exact ties — can
    flip membership between the two paths, which can then change
    components and survivor choice downstream. Callers with PINNED
    outputs keep the default; paths that own their operating point
    (semdedup k="auto" — whose x35b digests were pinned AFTER the
    round-9 flip to vectorized, so they pin this arithmetic — and
    semdedup_ingest, which shipped vectorized from birth) opt in.

    ``vectorized`` requires an integral ``id_col`` (the block kernel
    orders pairs with numpy min/max and declares an integer output
    schema); the default fold path handles any orderable id type via
    least/greatest. A non-integral id with vectorized=True raises."""
    base = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("_id"),
        as_double(vec_col).alias("_v"),
    ).withColumn("_nv", F.sqrt(norm_sq(F.col("_v"))))
    staged = base.withColumn(
        "_s", F.pmod(F.xxhash64("_id"), F.lit(shards)).cast("int")
    )
    memberships = F.array(
        *[
            F.struct(
                F.least(F.col("_s"), F.lit(t)).alias("i"),
                F.greatest(F.col("_s"), F.lit(t)).alias("j"),
            )
            for t in range(shards)
        ]
    )
    sharded = staged.select(
        "_blk",
        F.struct("_id", "_v", "_nv", "_s").alias("d"),
        F.explode(memberships).alias("g"),
    )
    if vectorized:
        import pandas as pd

        dts = dict(base.dtypes)
        blk_t, id_t = dts["_blk"], dts["_id"]
        if id_t not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"blocked_cosine_pairs(vectorized=True) requires an "
                f"integral id column; {id_col!r} is {id_t}. Use the "
                f"default fold path for non-integer ids."
            )
        out_schema = (
            f"`{block_col}` {blk_t}, vec_a {id_t}, vec_b {id_t}, "
            f"cosine double"
        )
        thr = float(threshold)  # close over a plain float, not a Column

        def emit(key, pdf: pd.DataFrame) -> pd.DataFrame:
            blk, i, j = key
            a = pdf[pdf["_s"] == i]
            b = pdf[pdf["_s"] == j]
            if len(a) and len(b):
                A = np.array(a["_v"].tolist(), dtype=np.float64)
                B = np.array(b["_v"].tolist(), dtype=np.float64)
                # fixed-order einsum, not BLAS matmul — see assign.py's
                # bit-stability note
                M = np.einsum("nd,kd->nk", A, B, optimize=False)
                denom = np.outer(
                    a["_nv"].to_numpy(dtype=np.float64),
                    b["_nv"].to_numpy(dtype=np.float64),
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(denom > 0, M / denom, -np.inf)
                ia = a["_id"].to_numpy()
                ib = b["_id"].to_numpy()
                mask = cos >= thr
                if i == j:
                    mask &= ia[:, None] < ib[None, :]
                r, c = np.nonzero(mask)
                ida, idb = ia[r], ib[c]
                return pd.DataFrame(
                    {
                        block_col: pd.Series([blk] * len(r)),
                        "vec_a": np.minimum(ida, idb),
                        "vec_b": np.maximum(ida, idb),
                        "cosine": cos[r, c],
                    }
                )
            return pd.DataFrame(
                {
                    block_col: pd.Series([], dtype=object),
                    "vec_a": pd.Series([], dtype="int64"),
                    "vec_b": pd.Series([], dtype="int64"),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )

        flat = sharded.select(
            "_blk",
            F.col("g.i").alias("i"),
            F.col("g.j").alias("j"),
            F.col("d._id").alias("_id"),
            F.col("d._v").alias("_v"),
            F.col("d._nv").alias("_nv"),
            F.col("d._s").alias("_s"),
        )
        return flat.groupBy("_blk", "i", "j").applyInPandas(emit, out_schema)

    grouped = sharded.groupBy("_blk", "g.i", "g.j").agg(
        F.collect_list("d").alias("vecs")
    )
    side_a = F.filter(F.col("vecs"), lambda d: d["_s"] == F.col("i"))
    side_b = F.filter(F.col("vecs"), lambda d: d["_s"] == F.col("j"))
    # DOUBLE EXPLODE, not nested transform/flatten (round-8 sf5 probe
    # finding, the same pathology x2_ngram_jaccard's pair stage already
    # documents): the HOF form MATERIALIZED the full |A|×|B| struct array
    # — with every cosine computed through interpreted boxed-double
    # lambdas — per grouped row before the explode could stream it; at
    # sf5 (~780 vectors per shard side) that is ~600k structs per row
    # across 32 concurrent tasks, which killed a 32 GB heap. Two Generate
    # operators stream the pairs: each first-level row carries only the
    # side_b array (bounded by block/shards vectors — shrink it with the
    # shard count), and the per-pair cosine fold is evaluated once per
    # OUTPUT ROW, never accumulated into an array.
    exploded = (
        grouped.select(
            "_blk",
            (F.col("i") == F.col("j")).alias("intra"),
            side_b.alias("vb"),
            F.explode(side_a).alias("x"),
        )
        .select("_blk", "intra", "x", F.explode("vb").alias("y"))
    )
    x, y = F.col("x"), F.col("y")
    return (
        exploded.filter((x["_id"] < y["_id"]) | ~F.col("intra"))
        .select(
            F.col("_blk").alias(block_col),
            F.least(x["_id"], y["_id"]).alias("vec_a"),
            F.greatest(x["_id"], y["_id"]).alias("vec_b"),
            (dot(x["_v"], y["_v"]) / (x["_nv"] * y["_nv"])).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semdedup_ingest(
    existing: DataFrame,
    batch: DataFrame,
    cents: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 0.35,
    shards: int = 4,
) -> DataFrame:
    """At-ingest semantic dedup: decide each NEW embedding against a
    frozen quantizer and the existing survivor set — the semantic twin
    of the MinHash dedup-at-ingest tier (x21), for corpora that arrive
    continuously instead of being deduped once.

    ``existing`` holds the kept docs so far (id + vector), ``cents`` is
    the frozen centroid matrix they were assigned under (production
    practice: retrain rarely, assign always — retraining per batch
    would reshuffle every historical cell). Returns one decision row
    per BATCH doc: (id, cell, component, cos_centroid, anchored, keep).

    Semantics (deterministic, order-free within the batch):
      1. ANCHOR — a new doc within ``eps`` cosine of ANY existing
         survivor in its cell is anchored: its semantic content is
         already represented.
      2. COMPONENT — new-new pairs within cells (the same triangle-
         sharded exact pair stage the batch path uses) form connected
         components among the batch docs.
      3. DECIDE — a component with ≥1 anchored member keeps NOTHING
         (transitively duplicate of existing content); an unanchored
         component keeps exactly one survivor — lowest cosine to its
         cell centroid, id tie-break (the paper's rule); unanchored
         singletons keep themselves.

    Re-ingesting an already-ingested batch therefore keeps zero docs
    (every doc anchors on its own survivor) — the idempotence test
    pins it. Ids must be globally unique across existing and batch.

    100 TB shape: the anchor check is an equi-join on (cell, salt) —
    the EXISTING side (the big one) never replicates; the batch side
    replicates ``shards``× to meet every existing salt, so a hot cell's
    join fan-in shrinks shards× exactly like the pair stage's triangle
    shards. Anchors aggregate to a distinct id set before touching the
    component stage. Nothing recomputes over history beyond one
    assignment scan of the existing survivors (id, cell) — and a caller
    that persisted cell at ingest time can pass it pre-assigned via a
    ``cell`` column ON THE EXISTING FRAME ONLY to skip even that
    (range-asserted 1..k at runtime; a ``cell`` column on the batch is
    ignored — the batch is always assigned against ``cents`` here, which
    also guarantees one decision row per batch doc through the
    centroid-cosine join).

    Physical choices this surface OWNS (it ships new — no pinned
    digests predate them): assignment always takes the vectorized
    einsum path (the literal HOF path is interpreted k·dim work per
    row — the round-9 probe's cliff — and an ingest quantizer is
    production-sized by definition), and the prepared BATCH side is
    stabilize()d because four downstream stages reuse it (anchor join,
    pair emission, centroid-cosine staging ×2) — re-deriving an
    interpreted assignment per stage made the first sf1 probe of this
    function 4.5× SLOWER than a full rebuild; materializing the small
    side is the 100 TB-sane fix (the big existing side streams through
    exactly once and is never persisted)."""
    from dmshadoop_spark.dedup.components import connected_components
    from dmshadoop_spark.functions.checkpoint import stabilize
    from dmshadoop_spark.similarity.assign import with_nearest_cell

    k = len(cents)

    def prep(df: DataFrame, allow_cell: bool) -> DataFrame:
        # A pre-assigned ``cell`` column is honored only on the EXISTING
        # frame (the docstring's promise — survivors persisted with
        # their cell at a prior ingest). The batch is ALWAYS assigned
        # here, so every batch cell is in 1..k by construction and the
        # centroid-cosine inner join below keeps exactly one decision
        # row per batch doc. Caller-supplied existing cells are range-
        # asserted at runtime (out-of-range would silently disable
        # anchoring for that survivor).
        use_cell = allow_cell and "cell" in df.columns
        base = df.select(
            F.col(id_col).alias("_id"),
            as_double(vec_col).alias("_v"),
            *([F.col("cell")] if use_cell else []),
        ).withColumn("_nv", F.sqrt(norm_sq(F.col("_v"))))
        if use_cell:
            base = base.withColumn(
                "cell",
                F.when(
                    (F.col("cell") >= 1) & (F.col("cell") <= F.lit(k)),
                    F.col("cell"),
                ).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "semdedup_ingest: pre-assigned cell out "
                                f"of range 1..{k} for id "
                            ),
                            F.col("_id").cast("string"),
                        )
                    )
                ),
            )
        else:
            base = with_nearest_cell(
                base, "_v", cents, out_col="cell", vectorized=True
            )
        return base

    ex = prep(existing, allow_cell=True)
    # hint_small: the batch is the small side by contract; stabilize()
    # strips compile-time size stats, so without the re-derived
    # broadcast hint the anchor join would plan as a shuffle join and
    # replicate the EXISTING side's salt column through an exchange.
    nb = stabilize(prep(batch, allow_cell=False), hint_small=True)

    # ANCHOR: salted cell-join — existing stays put, batch replicates
    ex_s = ex.withColumn(
        "_salt", F.pmod(F.xxhash64("_id"), F.lit(shards)).cast("int")
    )
    nb_s = nb.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(shards - 1)).cast("array<int>")),
    )
    anchored_ids = (
        nb_s.alias("n")
        .join(ex_s.alias("e"), ["cell", "_salt"])
        .where(
            dot(F.col("n._v"), F.col("e._v"))
            / (F.col("n._nv") * F.col("e._nv"))
            >= F.lit(eps)
        )
        .select(F.col("n._id").alias("_id"))
        .distinct()
    )

    # COMPONENT: new-new pairs within cells, exact triangle-sharded
    # the ingest surface owns its operating point (shipped round 9) —
    # numpy block cosine, not the interpreted per-pair fold
    pairs = blocked_cosine_pairs(
        nb, "cell", "_id", "_v", eps, shards, vectorized=True
    )
    comps = connected_components(pairs, src="vec_a", dst="vec_b")

    spark = SparkSession.getActiveSession()
    cent_df = centroid_frame(spark, cents)
    staged = (
        nb.join(broadcast(cent_df), "cell")
        .select(
            "_id",
            "cell",
            (
                dot(F.col("_v"), F.col("cent"))
                / (F.col("_nv") * F.col("ncent"))
            ).alias("cos_centroid"),
        )
        .join(comps.select(F.col("node").alias("_id"), "comp"), "_id", "left")
        .join(
            anchored_ids.withColumn("_anch", F.lit(True)), "_id", "left"
        )
        .select(
            "_id",
            "cell",
            F.coalesce("comp", F.col("_id")).alias("component"),
            F.round("cos_centroid", 6).alias("cos_centroid"),
            F.coalesce("_anch", F.lit(False)).alias("_anch"),
        )
    )
    # DECIDE: anchored components keep nothing; unanchored keep one
    comp_anchored = staged.groupBy("component").agg(
        F.max("_anch").alias("anchored")
    )
    w = Window.partitionBy("component").orderBy(
        F.asc("cos_centroid"), F.asc("_id")
    )
    return (
        staged.join(comp_anchored, "component")
        .withColumn("_rn", F.row_number().over(w))
        .select(
            F.col("_id").alias(id_col),
            "cell",
            "component",
            "cos_centroid",
            "anchored",
            ((F.col("_rn") == 1) & ~F.col("anchored")).alias("keep"),
        )
    )


# Above this cell count the auto-k path switches assignment to the
# vectorized einsum form (see semdedup() body). 32 is above every
# pinned operating point that could reach the auto path (driver-SF
# auto-k is 1) and below the first probed point where the literal path
# already lost (k=40 at sf1: 149.5s vs 72s at k=8); explicit-k callers
# (x35 k=8, IVF k=16, PQ codebooks k≤256) never see this constant.
SEMDEDUP_VECTORIZED_MIN_K = 32


def auto_k(n: int, target_cell_size: int = 500) -> int:
    """The bounded-cell-size law: k = ceil(n / target_cell_size).

    Intra-cell pair volume is O(n²/k); at FIXED k that is quadratic in
    corpus size (the round-8 sf3→sf5 probe measured exponent 1.62 at
    k=8), while k ∝ n keeps expected cell size — and therefore the pair
    stage's total work — LINEAR in n (the regime the SemDeDup paper
    runs: ~50k clusters over ~5×10⁹ LAION examples ≈ 10⁵ per cell).
    Trade: driver/broadcast state is k×dim doubles (at n=10⁹,
    target 500 ⇒ k=2M ⇒ ~1 GB at dim 64) — for corpora that large,
    raise target_cell_size or train centroids on a sample; the pair
    stage only needs cells bounded, not tiny."""
    return max(1, -(-n // target_cell_size))


def semdedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | str = "auto",
    n_iter: int = 4,
    seed: int = 7,
    eps: float = 0.35,
    shards: int = 4,
    target_cell_size: int = 500,
    assign: str = "exact",
    assign_nprobe: int = 8,
    train_sample: int | None = None,
) -> DataFrame:
    """Per-embedding SemDeDup decision:
    (id, cell, component, cos_centroid, keep) — ``keep`` marks the one
    survivor per semantic duplicate group (lowest centroid cosine, id
    tie-break); non-duplicated embeddings keep themselves.

    ``k="auto"`` (the default since round 9 — the round-8 verdict's top
    task) sizes the clustering by the bounded-cell-size law (auto_k):
    one bounded count() picks k = ceil(n / target_cell_size), so the
    intra-cell pair stage stays linear in corpus size instead of the
    O(n²/k) blow-up a fixed k gives. Pass an explicit int k to
    reproduce a pinned operating point (x35 pins k=8).

    ``assign="coarse"`` (opt-in; "exact" is the default and today's
    pinned behavior) routes the FULL-CORPUS final assignment through the
    two-level coarse-to-fine search (assign.with_nearest_cell_coarse,
    nprobe=``assign_nprobe``) — the scale path for the one remaining
    O(n·k·d) term when k itself is huge (n=10⁹ at target 500 ⇒ k=2M ⇒
    exact assignment is 2M×dim flops PER ROW; coarse-to-fine is
    ~√k/(1+nprobe) times less). Approximate: a row near a cell boundary
    may land in a probed-set-local nearest cell instead of the global
    one — for SemDeDup that only perturbs which block a boundary point
    pairs within, the same trade the paper's own k-means already makes.
    Training always uses the exact path (it runs on the bounded
    train_sample at that scale — kmeans_centroids docstring).

    ``train_sample`` (opt-in; None = full-corpus training, today's
    pinned behavior) bounds Lloyd's training set to a seeded-order
    prefix — threaded straight to kmeans_centroids, whose docstring has
    the determinism contract. Together, ``k="auto"`` +
    ``train_sample`` + ``assign="coarse"`` are the full production
    posture: pair stage linear by the cell bound, training capped at
    O(n_iter·sample·k·d), final assignment O(n·(√k + nprobe·k/√k)·d).
    Changing train_sample changes the trained centroids — never flip it
    under pinned outputs.

    WHICH POSTURE AT WHICH n (round-10 decision table; floors pinned by
    test_semdedup_coarse_posture_agreement_floor and
    test_semdedup_train_sample_survivor_stability, measured two decades
    out in SCALE.md / BENCH_r9_probes.json):

      n ≲ 10⁵ (k ≲ 200)      — defaults. Exact assignment is cheap,
                               full training converges fast; the coarse
                               level's √k would be single digits.
      10⁵ ≲ n ≲ 10⁷          — + train_sample=max(256·k_auto, 10⁵).
                               Lloyd's passes stop scaling with the
                               corpus; survivor decisions agree ≥90%
                               with full training on clustered data and
                               the kept fraction moves ≤5% (pinned).
      n ≳ 10⁷ (k ≳ 2·10⁴)    — + assign="coarse" (nprobe 8). The final
                               assignment drops from O(n·k·d) to
                               O(n·(√k + nprobe·k/√k)·d); cell
                               agreement ≥95% on clustered corpora
                               (pinned; observed 0.98-1.0), and a
                               boundary point merely pairs within a
                               neighboring block — the same trade the
                               paper's own k-means already makes.
      n ≳ 10⁹                — also raise target_cell_size (auto_k's
                               docstring: k=2M means a ~1 GB centroid
                               matrix as driver/broadcast state even
                               with the columnar round-10 plumbing).

    The composed posture (auto-k + train_sample + coarse) measured 2.5×
    faster than the default at sf3 (13.7 s vs 34.8 s) with the floors
    above — safe to recommend wherever exact-pinned outputs are not
    required."""
    from dmshadoop_spark.dedup.components import connected_components
    from dmshadoop_spark.similarity.assign import (
        with_nearest_cell,
        with_nearest_cell_coarse,
    )
    from dmshadoop_spark.similarity.kmeans import kmeans_centroids

    from dmshadoop_spark.catalog import widen

    # widen(): the full-corpus assignment fold and the pair staging are
    # scan-local CPU work — on the single-file test scan they would run
    # on one core (no-op at scale — catalog.widen docstring)
    base = widen(emb).select(
        F.col(id_col).alias("_id"), as_double(vec_col).alias("_v")
    ).withColumn("_nv", F.sqrt(norm_sq(F.col("_v"))))

    vectorized: bool | None = None
    pair_vectorized = False
    if k == "auto":
        # the auto path also owns the PAIR stage's physical form: the
        # numpy block cosine replaces the interpreted per-pair fold
        # (blocked_cosine_pairs docstring has the trade; pair volume is
        # ∝ n at any k under the cell-size bound, so this gate is not
        # k-conditional). Explicit-k callers (x35's pinned k=8 point)
        # keep the fold path — a pair exactly at eps could flip.
        pair_vectorized = True
        # one bounded driver scalar (a count), same class as the
        # convergence checks the component loop already does
        k = auto_k(emb.count(), target_cell_size)
        # the auto path OWNS its operating point, so it may flip the
        # assignment to the vectorized einsum path once the literal
        # path's interpreted zip_with folds (CodegenFallback — k·dim
        # boxed ops per row) would dominate: the round-9 probe measured
        # the literal path 2× SLOWER than fixed k=8 at k=40 and
        # crawling at k=120. Explicit-k callers (the pinned x35 point)
        # keep the default path pick — the two paths' float arithmetic
        # differs, so pinned outputs must never flip.
        vectorized = True if k > SEMDEDUP_VECTORIZED_MIN_K else None

    cents = kmeans_centroids(
        emb, vec_col=vec_col, k=k, n_iter=n_iter, seed=seed, id_col=id_col,
        vectorized=vectorized, train_sample=train_sample,
    )
    if assign == "coarse":
        assigned = with_nearest_cell_coarse(
            base, "_v", cents, nprobe=assign_nprobe, out_col="cell"
        )
    else:
        assigned = with_nearest_cell(
            base, "_v", cents, out_col="cell", vectorized=vectorized
        )

    spark = SparkSession.getActiveSession()
    cent_df = centroid_frame(spark, cents)
    with_cos = assigned.join(broadcast(cent_df), "cell").select(
        "_id",
        "_v",
        "cell",
        (
            dot(F.col("_v"), F.col("cent")) / (F.col("_nv") * F.col("ncent"))
        ).alias("cos_centroid"),
    )

    pairs = blocked_cosine_pairs(
        assigned, "cell", "_id", "_v", threshold=eps, shards=shards,
        vectorized=pair_vectorized,
    )
    comps = connected_components(pairs, src="vec_a", dst="vec_b")

    w = Window.partitionBy("component").orderBy(
        F.asc("cos_centroid"), F.asc("_id")
    )
    return (
        with_cos.join(
            comps.select(F.col("node").alias("_id"), "comp"), "_id", "left"
        )
        .select(
            "_id",
            "cell",
            F.coalesce("comp", F.col("_id")).alias("component"),
            F.round("cos_centroid", 6).alias("cos_centroid"),
        )
        .withColumn(
            "keep", F.row_number().over(w) == 1
        )
        .select(
            F.col("_id").alias(id_col),
            "cell",
            "component",
            "cos_centroid",
            "keep",
        )
    )
