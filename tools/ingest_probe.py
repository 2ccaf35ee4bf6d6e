"""semdedup_ingest probe: wall-clock of deciding a new batch against a
frozen quantizer + survivor set, vs re-running the full batch dedup on
the union — the number that justifies the at-ingest tier.

Protocol: the corpus splits 75/25 by md5 nibble (the x35d split). The
75% "existing" side is deduped ONCE outside the timed region (its cost
is history — already paid when that data arrived); the timed comparison
is then:
  * ingest   — semdedup_ingest(survivors, batch, frozen cents)
  * rebuild  — semdedup(existing ∪ batch) from scratch (what a pipeline
               without an ingest path must do per batch)
1 warmup + 3 passes each, median.

Usage: python tools/ingest_probe.py /tmp/sf1
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
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("ingest_probe")
        .getOrCreate()
    )
    from dmshadoop_spark.dedup import semdedup, semdedup_ingest
    from dmshadoop_spark.similarity.kmeans import kmeans_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    nib = F.substring(
        F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 1
    )
    is_batch = nib.isin("c", "d", "e", "f")
    existing = emb.where(~is_batch).cache()
    batch = emb.where(is_batch).cache()
    n_exist, n_batch = existing.count(), batch.count()

    # history: train + dedup the existing side once (not timed)
    k = "auto"
    cents = kmeans_centroids(
        existing, vec_col="embedding",
        k=max(1, -(-n_exist // 500)), n_iter=4, seed=7, id_col="vec_id",
    )
    decided = semdedup(
        existing, id_col="vec_id", vec_col="embedding",
        k=max(1, -(-n_exist // 500)), n_iter=4, seed=7, eps=0.35, shards=4,
    )
    survivors = existing.join(
        decided.where("keep").select("vec_id"), "vec_id"
    ).cache()
    n_surv = survivors.count()

    def timed(fn):
        times = []
        for i in range(4):
            t0 = time.monotonic()
            fn().count()
            dt = time.monotonic() - t0
            if i:
                times.append(dt)
        return statistics.median(times)

    ingest_s = timed(
        lambda: semdedup_ingest(
            survivors, batch, cents, id_col="vec_id",
            vec_col="embedding", eps=0.35, shards=4,
        )
    )
    rebuild_s = timed(
        lambda: semdedup(
            emb, id_col="vec_id", vec_col="embedding",
            k=k, n_iter=4, seed=7, eps=0.35, shards=4,
        )
    )
    out = {
        "sf_dir": sf_dir,
        "n_existing": n_exist,
        "n_batch": n_batch,
        "n_survivors": n_surv,
        "ingest_median_s": round(ingest_s, 4),
        "full_rebuild_median_s": round(rebuild_s, 4),
        "speedup": round(rebuild_s / ingest_s, 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
