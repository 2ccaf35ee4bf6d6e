"""Measure the JL+SQ8 composed ANN tier's recall-vs-candidate-budget
operating curve at a given SF (round-8 verdict task 4).

x5_knn_jl_sq8's recall@5 floor was pinned at a FIXED 80-candidate budget
(expand=16) on 500/2k-vector corpora — 16%/4% of the corpus. The
candidate count does not grow with N, so the candidate FRACTION shrinks
and recall must fall as N grows; this probe measures by how much, for
expand in {16, 32, 64}, using exactly the query discipline of the
registered entry (queries = vec_id < 8, ground truth = exact top-5
excluding self).

Usage: python tools/jl_sq8_recall_probe.py SF_DIR [SF_DIR...] \
           [--expand 16,32,64] [--d-out 32]
Prints one JSON line: {"per_sf": {sf_dir: {"n": N, "recall@5":
{expand: r}}}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dmshadoop_spark.session import get_spark  # noqa: E402
from dmshadoop_spark.similarity import brute_force_knn, jl_sq8_knn  # noqa: E402


def recall_at_5(spark, sf_dir: str, expand: int, d_out: int) -> tuple[int, float]:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    exact = (
        brute_force_knn(emb, queries_df, k=6)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    topk, _ = jl_sq8_knn(emb, queries_df, k=5, expand=expand, d_out=d_out)
    hits = exact.join(
        topk.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).count()
    total = exact.count()
    return emb.count(), hits / total


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dirs", nargs="+")
    ap.add_argument("--expand", default="16,32,64")
    ap.add_argument("--d-out", type=int, default=32)
    ns = ap.parse_args(argv)
    expands = [int(x) for x in ns.expand.split(",")]

    spark = get_spark(app_name="jl-sq8-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    per_sf: dict = {}
    for sf_dir in ns.sf_dirs:
        row: dict = {"recall@5": {}}
        for e in expands:
            n, r = recall_at_5(spark, sf_dir, e, ns.d_out)
            row["n"] = n
            row["recall@5"][str(e)] = round(r, 4)
            print(f"# {sf_dir} n={n} expand={e}: recall@5={r:.4f}",
                  file=sys.stderr)
        per_sf[sf_dir] = row
    print(json.dumps({"metric": "jl_sq8_recall_curve", "d_out": ns.d_out,
                      "per_sf": per_sf}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
