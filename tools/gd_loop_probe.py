"""Round-13 probe: where does x36's ~0.5 s/GD-iteration floor go, and
which loop form removes it?

Variants (all must produce BIT-IDENTICAL weights — asserted):
  A  current: session conf pinned (shuffle.partitions=1, AQE off) for the
     loop, weight literals rendered per iteration (one F.expr).
  B  conf-free: session defaults (AQE on, 32 shuffle partitions), same
     literal margin — isolates what the conf pin is worth.
  C  conf-free + parameterized iteration: weights ride a 1-row
     broadcast-joined frame instead of plan literals, so every
     iteration's plan (and its generated code) is structurally
     identical — codegen cache hits instead of a fresh compile per
     round (r12 verdict task 3).

Per iteration we time: plan build (createDataFrame + expression),
execute+collect. Usage: python tools/gd_loop_probe.py [sf_dir] [n_iter]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dmshadoop_spark.functions.sqllit import sql_double, sql_double_array

DECIMAL = "decimal(38,18)"


def margin_literal(x_col, weights, bias):
    w = sql_double_array(weights)
    return F.expr(
        f"{sql_double(bias)} + aggregate(zip_with({w},`{x_col}`,"
        f"(w,xi)->w*xi),0.0D,(acc,v)->acc+v)"
    )


def one_iter_literal(feat, x_col, label_col, dim, weights, bias):
    staged = feat.select(
        F.col(x_col).alias("x"),
        (
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin_literal(x_col, weights, bias))))
            - F.col(label_col).cast("double")
        ).alias("r"),
    )
    return (
        staged.select(
            "r",
            F.posexplode(F.concat(F.col("x"), F.array(F.lit(1.0)))).alias(
                "pos", "xi"
            ),
        )
        .groupBy("pos")
        .agg(F.sum((F.col("r") * F.col("xi")).cast(DECIMAL)).alias("g"))
        .collect()
    )


def one_iter_param(spark, feat, x_col, label_col, dim, weights, bias):
    wdf = spark.createDataFrame(
        [([float(v) for v in weights], float(bias))],
        "_w array<double>, _b double",
    )
    margin = F.col("_b") + F.aggregate(
        F.zip_with(F.col("_w"), F.col(x_col), lambda w, xi: w * xi),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    staged = feat.crossJoin(F.broadcast(wdf)).select(
        F.col(x_col).alias("x"),
        (
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)))
            - F.col(label_col).cast("double")
        ).alias("r"),
    )
    return (
        staged.select(
            "r",
            F.posexplode(F.concat(F.col("x"), F.array(F.lit(1.0)))).alias(
                "pos", "xi"
            ),
        )
        .groupBy("pos")
        .agg(F.sum((F.col("r") * F.col("xi")).cast(DECIMAL)).alias("g"))
        .collect()
    )


def run_loop(spark, feat, variant: str, dim=64, n_iter=12, lr=4.0):
    n = feat.count()
    weights = [0.0] * dim
    bias = 0.0
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        if variant == "param":
            grad_rows = one_iter_param(spark, feat, "x", "y", dim, weights, bias)
        else:
            grad_rows = one_iter_literal(feat, "x", "y", dim, weights, bias)
        times.append(time.perf_counter() - t0)
        grad = [0.0] * (dim + 1)
        for row in grad_rows:
            grad[row["pos"]] = float(row["g"])
        weights = [w - lr * g / n for w, g in zip(weights, grad[:dim])]
        bias = bias - lr * grad[dim] / n
    return weights, bias, times


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from dmshadoop_spark.catalog import load_table
    from dmshadoop_spark.functions.checkpoint import stabilize
    from dmshadoop_spark.functions.text import stopword_ratio, tokenize
    from dmshadoop_spark.operators.logreg import hashed_features, standardize
    from dmshadoop_spark.session import get_spark

    spark = get_spark(app_name="gd-loop-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    labels = docs.select(
        "doc_id",
        (stopword_ratio(tokenize("text")) >= 0.06).cast("int").alias("y"),
    )
    raw = stabilize(hashed_features(docs, dim=64).join(labels, "doc_id"))
    feat0, _mu, _sd = standardize(raw, "x", dim=64)
    dp = spark.sparkContext.defaultParallelism
    feat = stabilize(feat0.repartition(dp, "doc_id"))

    conf = spark.conf
    results = {}
    for variant in ("A_confpin_literal", "B_conffree_literal", "C_conffree_param",
                    "B2_conffree_literal", "C2_conffree_param"):
        if variant.startswith("A"):
            old_parts = conf.get("spark.sql.shuffle.partitions")
            old_aqe = conf.get("spark.sql.adaptive.enabled")
            conf.set("spark.sql.shuffle.partitions", "1")
            conf.set("spark.sql.adaptive.enabled", "false")
        try:
            t0 = time.perf_counter()
            w, b, times = run_loop(
                spark, feat,
                "param" if "param" in variant else "literal",
                n_iter=n_iter,
            )
            wall = time.perf_counter() - t0
        finally:
            if variant.startswith("A"):
                conf.set("spark.sql.shuffle.partitions", old_parts)
                conf.set("spark.sql.adaptive.enabled", old_aqe)
        results[variant] = {
            "wall": round(wall, 3),
            "per_iter": [round(t, 3) for t in times],
            "w": w,
            "b": b,
        }
        print(
            f"{variant}: wall={wall:.3f}s "
            f"per_iter={[round(t, 3) for t in times]}",
            flush=True,
        )

    ref = results["A_confpin_literal"]
    for k, v in results.items():
        same = v["w"] == ref["w"] and v["b"] == ref["b"]
        print(f"{k}: weights bit-identical to A: {same}", flush=True)


if __name__ == "__main__":
    main()
