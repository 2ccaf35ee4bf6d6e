"""Coarse-to-fine assignment probe: measures the two-level
(with_nearest_cell_coarse) final assignment against the exact vectorized
path (with_nearest_cell(vectorized=True)) at growing centroid counts on
a fixed corpus — the regime the bounded-cell-size law creates (k ∝ n, so
the O(n·k·d) exact assignment becomes O(n²·d/target) while the two-level
search stays O(n·(√k + nprobe·k/√k)·d)).

Centroids are a deterministic hash-ordered sample of the corpus itself
(the same init kmeans_centroids uses at n_iter=0), so the probe isolates
ASSIGNMENT cost — no training in the timed region. Reports median-of-3
wall per strategy plus the agreement fraction (how many rows the
approximate path assigns to the exact nearest cell).

Usage:
    python tools/coarse_assign_probe.py /tmp/sf1 40 400 2000 [--nprobe 8]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    nprobe = 8
    if "--nprobe" in sys.argv:
        nprobe = int(sys.argv[sys.argv.index("--nprobe") + 1])
    if len(args) < 2:
        print(__doc__)
        return 2
    sf_dir, ks = args[0], [int(k) for k in args[1:]]

    from dmshadoop_spark.similarity.assign import (
        coarse_quantize,
        with_nearest_cell,
        with_nearest_cell_coarse,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("coarse_assign_probe")
        .getOrCreate()
    )
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("_v"),
        )
        .cache()
    )
    n = emb.count()

    # deterministic hash-ordered sample as fine centroids (kmeans init,
    # n_iter=0 — assignment cost is independent of how centroids trained)
    out: dict = {"sf_dir": sf_dir, "n": n, "nprobe": nprobe, "points": []}
    for k in ks:
        seed_rows = (
            emb.orderBy(
                F.xxhash64("vec_id", F.lit(42)).asc(), F.col("vec_id").asc()
            )
            .limit(k)
            .collect()
        )
        cents = np.array([r["_v"] for r in seed_rows], dtype=np.float64)
        n_coarse = len(coarse_quantize(cents)[0])

        def timed(fn):
            times = []
            res = None
            for i in range(4):  # 1 warmup + 3 measured
                t0 = time.monotonic()
                res = {
                    r["vec_id"]: r["cell"]
                    for r in fn().select("vec_id", "cell").collect()
                }
                dt = time.monotonic() - t0
                if i:
                    times.append(dt)
            return statistics.median(times), res

        exact_s, exact_map = timed(
            lambda: with_nearest_cell(emb, "_v", cents, vectorized=True)
        )
        coarse_s, coarse_map = timed(
            lambda: with_nearest_cell_coarse(emb, "_v", cents, nprobe=nprobe)
        )
        agree = sum(
            1 for i, c in exact_map.items() if coarse_map[i] == c
        ) / len(exact_map)
        point = {
            "k": k,
            "n_coarse": n_coarse,
            "exact_vectorized_median_s": round(exact_s, 4),
            "coarse_median_s": round(coarse_s, 4),
            "speedup": round(exact_s / coarse_s, 2),
            "agreement": round(agree, 4),
        }
        out["points"].append(point)
        print(json.dumps(point))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
