"""Round-13 probe: the PQ-trainer Lloyd loop (ksub=256, dsub=8 — the
x5_pq_recall shape) under three loop forms plus thread-pooled subspace
training. All variants must produce BIT-IDENTICAL centroids (asserted).

  A  current: session conf pinned (shuffle.partitions=1, AQE off),
     centroid-matrix literal rendered per round (one F.expr).
  B  conf-free: session defaults (AQE on), same literal matrix.
  C  conf-free + parameterized: the centroid matrix rides a 1-row
     broadcast-joined frame, so every round's plan is structurally
     identical (codegen cache hit; tiny analysis tree).
  pool  C's loop, m=8 subspaces trained concurrently from a thread pool
     (guide §2.6) vs sequentially.

Usage: python tools/lloyd_probe.py [sf_dir] [k] [n_iter]
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from dmshadoop_spark.functions.sqllit import sql_double_array

DECIMAL = "decimal(38,18)"


def dist_literal(vec_col: str, cents: np.ndarray):
    mat = "array(" + ",".join(sql_double_array(r) for r in cents) + ")"
    return F.expr(
        f"transform({mat}, __cent -> aggregate(zip_with(`{vec_col}`, __cent,"
        f"(__x,__y)->(__x-__y)*(__x-__y)), 0.0D, (__acc,__x)->__acc+__x))"
    )


def assign_literal(df, vec_col, cents):
    staged = df.withColumn("_d", dist_literal(vec_col, cents))
    return staged.withColumn(
        "cell", F.array_position(F.col("_d"), F.array_min(F.col("_d")))
    ).drop("_d")


def assign_param(df, vec_col, cents):
    spark = df.sparkSession
    mdf = spark.createDataFrame(
        [([[float(x) for x in row] for row in cents],)],
        "_mat array<array<double>>",
    )
    staged = df.crossJoin(F.broadcast(mdf)).withColumn(
        "_d",
        F.transform(
            F.col("_mat"),
            lambda c: F.aggregate(
                F.zip_with(F.col(vec_col), c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        ),
    )
    return staged.withColumn(
        "cell", F.array_position(F.col("_d"), F.array_min(F.col("_d")))
    ).drop("_d", "_mat")


def lloyd(vecs, cents, n_iter, assign_fn):
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        staged = assign_fn(vecs.select("_v"), "_v", cents)
        upd = (
            staged.select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.col("x").cast(DECIMAL)).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cell",
                "pos",
                (F.col("s").cast("double") / F.col("n")).alias("m"),
            )
            .toPandas()
        )
        times.append(time.perf_counter() - t0)
        new_cents = cents.copy()
        new_cents[
            upd["cell"].to_numpy(dtype=np.int64) - 1,
            upd["pos"].to_numpy(dtype=np.int64),
        ] = upd["m"].to_numpy(dtype=np.float64)
        if np.array_equal(new_cents, cents):
            break
        cents = new_cents
    return cents, times


def train_one(spark, vecs, k, n_iter, seed, assign_fn):
    order = [F.xxhash64(F.to_json(F.col("_v")), F.lit(seed)).asc()]
    init_pdf = vecs.orderBy(*order).limit(k).select("_v").toPandas()
    cents = np.array(init_pdf["_v"].tolist(), dtype=np.float64)
    return lloyd(vecs, cents, n_iter, assign_fn)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from dmshadoop_spark.catalog import load_table, widen
    from dmshadoop_spark.functions.checkpoint import stabilize
    from dmshadoop_spark.functions.vectors import as_double
    from dmshadoop_spark.session import get_spark

    spark = get_spark(app_name="lloyd-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")

    # the PQ subspace shape: 8-dim slices of the embedding
    def subspace(j, dsub=8):
        sub = widen(
            emb.filter(F.col("embedding").isNotNull()).select(
                F.slice(as_double("embedding"), j * dsub + 1, dsub).alias("_v")
            )
        )
        sub = stabilize(sub.select("_v"))
        dp = spark.sparkContext.defaultParallelism
        if sub.rdd.getNumPartitions() < dp:
            sub = stabilize(sub.repartition(dp))
        return sub

    vecs = subspace(0)
    conf = spark.conf
    results = {}
    for variant, fn in (
        ("A_confpin_literal", assign_literal),
        ("B_conffree_literal", assign_literal),
        ("C_conffree_param", assign_param),
        ("B2_conffree_literal", assign_literal),
        ("C2_conffree_param", assign_param),
    ):
        if variant.startswith("A"):
            old_parts = conf.get("spark.sql.shuffle.partitions")
            old_aqe = conf.get("spark.sql.adaptive.enabled")
            conf.set("spark.sql.shuffle.partitions", "1")
            conf.set("spark.sql.adaptive.enabled", "false")
        try:
            t0 = time.perf_counter()
            cents, times = train_one(spark, vecs, k, n_iter, 42, fn)
            wall = time.perf_counter() - t0
        finally:
            if variant.startswith("A"):
                conf.set("spark.sql.shuffle.partitions", old_parts)
                conf.set("spark.sql.adaptive.enabled", old_aqe)
        results[variant] = cents
        print(
            f"{variant}: wall={wall:.3f}s per_round="
            f"{[round(t, 3) for t in times]}",
            flush=True,
        )

    ref = results["A_confpin_literal"]
    for kk, v in results.items():
        print(f"{kk}: centroids bit-identical to A: {np.array_equal(v, ref)}",
              flush=True)

    # thread-pool across 8 subspaces (conf-free param form)
    subs = [subspace(j) for j in range(8)]
    t0 = time.perf_counter()
    seq = [
        train_one(spark, s, k, n_iter, 42 + j, assign_param)[0]
        for j, s in enumerate(subs)
    ]
    t_seq = time.perf_counter() - t0
    print(f"sequential 8 subspaces: {t_seq:.3f}s", flush=True)
    for workers in (2, 4, 8):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=workers) as pool:
            par = list(
                pool.map(
                    lambda sj: train_one(
                        spark, sj[1], k, n_iter, 42 + sj[0], assign_param
                    )[0],
                    enumerate(subs),
                )
            )
        t_par = time.perf_counter() - t0
        same = all(np.array_equal(a, b) for a, b in zip(seq, par))
        print(
            f"pooled({workers}) 8 subspaces: {t_par:.3f}s "
            f"(x{t_seq / t_par:.2f}); identical: {same}",
            flush=True,
        )


if __name__ == "__main__":
    main()
