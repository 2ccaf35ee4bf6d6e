"""Steady-state composed-ingest probe (round-11 verdict task 8): the
round-11 pipeline probe measured clean → substring → semantic → packing
as a ONE-SHOT batch job; this probe measures the pipeline a production
corpus actually runs in STEADY STATE — the corpus is already processed
(occurrence index built, semantic quantizer frozen, survivor set
persisted) and N incoming batches each flow through

    clean gates → substring_ingest (vs the persisted index)
                → semdedup_ingest (vs frozen centroids + survivors)
                → sequence packing of the batch's survivors

with the index and the survivor set GROWING as batches are accepted.
The O(batch) claim extended to the composition: per-batch wall must be
flat across batch count.

Batch fixture: the sf0.1 documents (5k docs) with ids shifted per
round; HALF keep their original text (duplicating corpus content —
the substring stage excises them, the semantic stage anchors them),
half get round-tagged all-novel tokens (accepted and appended).
Batch embeddings reuse the base rows under the shifted ids.

Fresh process per measured point:

    python tools/pipeline_ingest_probe.py setup /tmp/pipe /tmp/sf1o
    python tools/pipeline_ingest_probe.py batch /tmp/pipe 1
    python tools/pipeline_ingest_probe.py batch /tmp/pipe 2
    ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

BASE_SF = "/root/testdata/sf0.1"
MIN_LEN = 10
K_CELLS = 8
EPS = 0.35


def _spark():
    from dmshadoop_spark.session import get_spark

    return get_spark(app_name="pipeline-ingest-probe")


def _clean(docs):
    from dmshadoop_spark.functions.text import (
        STOPWORDS,
        stopword_ratio,
        tokenize,
    )

    staged = docs.select("doc_id", "source", "text",
                         tokenize("text").alias("toks"))
    n_stops = F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS)))
    gated = staged.filter(F.size("toks") >= 20).filter(
        (n_stops == 0) | (stopword_ratio(F.col("toks")) <= 0.15)
    )
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        "doc_id"
    )
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text")
    )


def cmd_setup(root: str, corpus_dir: str) -> None:
    from dmshadoop_spark.catalog import load_table
    from dmshadoop_spark.dedup import build_occurrence_index, semdedup
    from dmshadoop_spark.functions.checkpoint import stabilize
    from dmshadoop_spark.similarity.kmeans import kmeans_centroids

    spark = _spark()
    os.makedirs(root, exist_ok=True)
    t0 = time.monotonic()
    clean = stabilize(_clean(load_table(spark, corpus_dir, "documents")))
    n_clean = clean.count()
    build_occurrence_index(
        clean, os.path.join(root, "idx"), min_len=MIN_LEN, buckets=256
    )
    emb = load_table(spark, corpus_dir, "embeddings").join(
        clean.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    cents = kmeans_centroids(
        emb, vec_col="embedding", k=K_CELLS, n_iter=4, seed=7,
        id_col="vec_id",
    )
    np.save(os.path.join(root, "cents.npy"), cents)
    decided = semdedup(
        emb, id_col="vec_id", vec_col="embedding",
        k=K_CELLS, n_iter=4, seed=7, eps=EPS, shards=4,
    )
    surv = emb.join(
        decided.where("keep").select("vec_id", "cell"), "vec_id"
    ).select("vec_id", "embedding", "cell")
    surv.write.mode("overwrite").parquet(os.path.join(root, "survivors"))
    print(json.dumps({
        "step": "setup", "n_clean": n_clean,
        "setup_s": round(time.monotonic() - t0, 3),
    }))


def cmd_batch(root: str, k: int) -> None:
    from dmshadoop_spark.catalog import load_table
    from dmshadoop_spark.dedup import (
        read_occurrence_index,
        semdedup_ingest,
        substring_ingest,
    )
    from dmshadoop_spark.functions.checkpoint import stabilize

    spark = _spark()
    idx = os.path.join(root, "idx")
    cents = np.load(os.path.join(root, "cents.npy"))
    surv_path = os.path.join(root, "survivors")
    shift = 100_000_000 * k
    stages: dict[str, float] = {}
    counts: dict[str, int] = {}

    def mark(name, thunk):
        # thunk, not frame: substring_ingest/semdedup_ingest do eager
        # work (stabilize, index append) INSIDE the call — timing must
        # bracket the call itself, not just the final materialization
        t0 = time.monotonic()
        out = stabilize(thunk())
        counts[name] = out.count()
        stages[name] = round(time.monotonic() - t0, 3)
        return out

    base = load_table(spark, BASE_SF, "documents")
    batch = base.select(
        (F.col("doc_id") + shift).alias("doc_id"),
        "source",
        F.when(
            F.col("doc_id") % 2 == 0, F.col("text")
        ).otherwise(
            F.regexp_replace("text", r"(\S+)", f"$1_r{k}")
        ).alias("text"),
    )
    clean = mark("clean", lambda: _clean(batch))
    sub = mark(
        "substring",
        lambda: substring_ingest(clean, idx, min_len=MIN_LEN).select(
            "doc_id", "clean_text", "kept_tokens"
        ),
    )
    # survivors of excision with enough left to keep
    kept_docs = sub.filter(F.col("kept_tokens") >= 20)
    batch_emb = load_table(spark, BASE_SF, "embeddings").join(
        kept_docs.select(
            (F.col("doc_id") - shift).alias("vec_id"),
            F.col("doc_id").alias("_new_id"),
        ),
        "vec_id",
    ).select(F.col("_new_id").alias("vec_id"), "embedding")
    existing = spark.read.parquet(surv_path)
    sem = mark(
        "semantic",
        lambda: semdedup_ingest(
            existing, batch_emb, cents, id_col="vec_id",
            vec_col="embedding", eps=EPS, shards=4,
        ),
    )
    new_surv = batch_emb.join(
        sem.where("keep").select("vec_id", "cell"), "vec_id"
    ).select("vec_id", "embedding", "cell")
    new_surv.write.mode("append").parquet(surv_path)
    final = kept_docs.join(
        sem.where("keep").select(F.col("vec_id").alias("doc_id")), "doc_id"
    ).join(clean.select("doc_id", "source"), "doc_id")
    wp = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mark(
        "packing",
        lambda: final.select(
            "source",
            F.floor(
                F.coalesce(F.sum("kept_tokens").over(wp), F.lit(0)) / 2048
            ).alias("bin"),
            "kept_tokens",
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("kept_tokens").alias("n_tokens")),
    )
    index_rows = read_occurrence_index(spark, idx).count()
    n_surv = spark.read.parquet(surv_path).count()
    total = round(sum(stages.values()), 3)
    print(json.dumps({
        "step": "batch", "k": k, "stages_s": stages, "counts": counts,
        "total_s": total, "index_rows": index_rows,
        "survivors": n_surv,
    }))


def main() -> None:
    cmd, root = sys.argv[1], sys.argv[2]
    if cmd == "setup":
        cmd_setup(root, sys.argv[3])
    elif cmd == "batch":
        cmd_batch(root, int(sys.argv[3]))
    else:
        raise SystemExit(f"unknown step {cmd}")


if __name__ == "__main__":
    main()
