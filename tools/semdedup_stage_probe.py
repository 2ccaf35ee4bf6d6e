"""Break SemDeDup's wall time into its stages at a given SF — which term
dominates under the auto-k law? (round-9 follow-up to the round-8 sf3/sf5
probe: auto-k makes the PAIR stage linear, but Lloyd assignment is
O(n·k·d) = O(n²·d/target) at k ∝ n, and plan-compile of the literal
centroid path grows with k — this probe says which one the wall clock
actually buys.)

Stages timed (cumulative boundaries forced with count/noop actions):
  train    — kmeans_centroids (n_iter Lloyd rounds, assignment + update)
  assign   — final with_nearest_cell over the corpus
  pairs    — blocked_cosine_pairs at eps (the triangle-sharded scan)
  full     — the whole semdedup() decision set (adds components+survivor)

Usage: python tools/semdedup_stage_probe.py SF_DIR [k|auto]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dmshadoop_spark.dedup.semdedup import (  # noqa: E402
    auto_k,
    blocked_cosine_pairs,
    semdedup,
)
from dmshadoop_spark.functions.vectors import as_double, norm_sq  # noqa: E402
from dmshadoop_spark.session import get_spark  # noqa: E402
from dmshadoop_spark.similarity.assign import with_nearest_cell  # noqa: E402
from dmshadoop_spark.similarity.kmeans import kmeans_centroids  # noqa: E402


def main(sf_dir: str, k_arg: str) -> None:
    from dmshadoop_spark.dedup.semdedup import SEMDEDUP_VECTORIZED_MIN_K

    spark = get_spark(app_name="semdedup-stage-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    k = auto_k(n) if k_arg == "auto" else int(k_arg)
    # match production semdedup(k="auto") EXACTLY: the auto path flips to
    # the vectorized assignment above the threshold, and the per-stage
    # calls below must run the same code path the full run does (found in
    # review: the first version resolved k to an int and measured the
    # literal path production no longer runs for auto)
    vectorized = (
        True if k_arg == "auto" and k > SEMDEDUP_VECTORIZED_MIN_K else None
    )

    out: dict = {"metric": "semdedup_stage_probe", "sf_dir": sf_dir,
                 "n": n, "k": k, "vectorized": bool(vectorized)}

    t0 = time.perf_counter()
    cents = kmeans_centroids(
        emb, vec_col="embedding", k=k, n_iter=4, seed=7, id_col="vec_id",
        vectorized=vectorized,
    )
    out["train_s"] = round(time.perf_counter() - t0, 2)

    base = emb.select(
        F.col("vec_id").alias("_id"), as_double("embedding").alias("_v")
    ).withColumn("_nv", F.sqrt(norm_sq(F.col("_v"))))
    t0 = time.perf_counter()
    assigned = with_nearest_cell(
        base, "_v", cents, out_col="cell", vectorized=vectorized
    )
    assigned.write.format("noop").mode("overwrite").save()
    out["assign_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    blocked_cosine_pairs(
        assigned, "cell", "_id", "_v", threshold=0.35, shards=4
    ).write.format("noop").mode("overwrite").save()
    out["pairs_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    semdedup(emb, id_col="vec_id", vec_col="embedding",
             k="auto" if k_arg == "auto" else k,
             n_iter=4, seed=7, eps=0.35, shards=4).write.format(
        "noop").mode("overwrite").save()
    out["full_s"] = round(time.perf_counter() - t0, 2)
    out["load_avg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "auto")
