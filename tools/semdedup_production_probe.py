"""SemDeDup production-posture probe: measures the three scale knobs
COMPOSED — the configuration a 100 TB run would actually use — against
the plain auto-k default, on the same corpus.

  1. auto_k_default      — x35b's posture: k = n/500, full-corpus
                           training, exact vectorized assignment
  2. + train_sample      — Lloyd on a seeded-order prefix (the faiss
                           max_points_per_centroid discipline); caps the
                           dominant driver-synchronized training term
  3. + assign="coarse"   — two-level coarse-to-fine final assignment
                           (the last O(n·k·d) full-corpus term)

Configs 2/3 train DIFFERENT centroids than config 1 (a bounded sample
is a different training set), so keep-sets are not comparable across
configs — the probe reports wall clock and decision-set sizes, not
equality. 1 warmup + 3 passes each, median.

Usage: python tools/semdedup_production_probe.py /tmp/sf1 [train_sample]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1]
    train_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 6144
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("semdedup_production_probe")
        .getOrCreate()
    )
    from dmshadoop_spark.dedup import semdedup
    from dmshadoop_spark.dedup.semdedup import auto_k

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).cache()
    n = emb.count()

    def run(label, **kw):
        times, n_keep = [], None
        for i in range(4):
            t0 = time.monotonic()
            out = semdedup(
                emb, id_col="vec_id", vec_col="embedding",
                k="auto", n_iter=4, seed=7, eps=0.35, shards=4, **kw,
            )
            n_keep = out.where("keep").count()
            dt = time.monotonic() - t0
            if i:
                times.append(dt)
        return {
            "config": label,
            "median_s": round(statistics.median(times), 4),
            "n_keep": n_keep,
        }

    results = [
        run("auto_k_default"),
        run(f"sample_{train_sample}", train_sample=train_sample),
        run(
            f"sample_{train_sample}_coarse_assign",
            train_sample=train_sample, assign="coarse", assign_nprobe=8,
        ),
    ]
    print(json.dumps(
        {"sf_dir": sf_dir, "n": n, "auto_k": auto_k(n), "points": results}
    ))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
