"""Composed corpus-prep pipeline probe (round-10 verdict task 6): the
four-stage story a user actually runs — clean (x7 shape) → exact-substring
dedup (x39) → semantic dedup (x35b auto-k) → sequence packing (x25) — as
ONE flow over a scale fixture, with per-stage wall timing so the
composition's exponents and stage shares are measured, not inferred from
the stages' standalone lanes.

Stage boundaries are materialized (stabilize + count) so each timing is
one stage's real work; stage inputs are the previous stage's SURVIVORS
(clean gates feed substring dedup; substring survivors select the
embedding rows semantic dedup sees; semantic survivors' substring-clean
text is what packing bins). Fixture: gen_scale.py --open-vocab replicas
of sf0.1 (the dedup-honest regime — bounded shingle df; quality gates
still fire because replica 0 keeps the base vocabulary).

Fresh-process protocol (one factor per invocation, same as the other
probes):

    python tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf1o 10 --open-vocab
    python tools/pipeline_probe.py /tmp/sf1o
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1]

    from dmshadoop_spark.catalog import load_table
    from dmshadoop_spark.dedup import semdedup, substring_dedup
    from dmshadoop_spark.functions.checkpoint import stabilize
    from dmshadoop_spark.functions.text import (
        STOPWORDS,
        stopword_ratio,
        tokenize,
    )
    from dmshadoop_spark.session import get_spark

    spark = get_spark()
    stages: dict[str, float] = {}
    counts: dict[str, int] = {}

    def mark(name: str, df):
        t0 = time.monotonic()
        out = stabilize(df)
        counts[name] = out.count()
        stages[name] = round(time.monotonic() - t0, 3)
        return out

    # stage 1 — clean: language gate, quality gate, exact dedup (x7)
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", "source", "text", tokenize("text").alias("toks")
    )
    n_stops = F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS)))
    gated = staged.filter(F.size("toks") >= 20).filter(
        (n_stops == 0) | (stopword_ratio(F.col("toks")) <= 0.15)
    )
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        "doc_id"
    )
    clean = mark(
        "clean",
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text"),
    )

    # stage 2 — exact-substring dedup over the survivors (x39)
    sub = mark(
        "substring",
        substring_dedup(clean, "doc_id", "text", min_len=10).select(
            "doc_id", "clean_text", "kept_tokens"
        ),
    )

    # stage 3 — semantic dedup on the survivors' embeddings (x35b auto-k)
    emb = load_table(spark, sf_dir, "embeddings").join(
        sub.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sem_drop = mark(
        "semantic",
        semdedup(
            emb, id_col="vec_id", vec_col="embedding",
            k="auto", n_iter=4, seed=7, eps=0.35, shards=4,
        ).filter(~F.col("keep")).select("vec_id"),
    )

    # stage 4 — sequence packing of the final corpus (x25 shape);
    # semantic dedup can only DROP docs it has embeddings for — docs
    # without an embedding row pass through (anti-join the drop set)
    final = sub.join(
        sem_drop.select(F.col("vec_id").alias("doc_id")),
        "doc_id",
        "left_anti",
    ).join(clean.select("doc_id", "source"), "doc_id")
    wp = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = mark(
        "packing",
        final.select(
            "source",
            F.floor(
                F.coalesce(F.sum("kept_tokens").over(wp), F.lit(0)) / 2048
            ).alias("bin"),
            "kept_tokens",
        )
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept_tokens").alias("n_tokens"),
        ),
    )
    _ = packed

    total = round(sum(stages.values()), 3)
    print(
        json.dumps(
            {
                "probe": "composed_pipeline",
                "sf_dir": sf_dir,
                "stages_s": stages,
                "stage_share": {
                    k: round(v / total, 3) for k, v in stages.items()
                },
                "counts": counts,
                "total_s": total,
            }
        )
    )


if __name__ == "__main__":
    main()
