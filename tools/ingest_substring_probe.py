"""Substring-ingest scale probe (round 11): pins x42's O(batch) claim.

Holds the BATCH fixed (the base sf0.1 documents, 5k docs, ids shifted
out of the corpus keyspace) while the indexed CORPUS grows 10x → 30x
(open-vocab fixtures from gen_scale.py), and times:

  * index_build_s  — build_occurrence_index over the corpus (one-time,
                     expected ~linear in corpus)
  * ingest_s       — substring_ingest of the fixed batch (expected to
                     grow ONLY with the index's sequential two-column
                     scan — no shuffle/sort term; the exponent vs
                     corpus size should sit well under 1)

Fresh process per corpus size:

    python tools/ingest_substring_probe.py /tmp/sf1o
    python tools/ingest_substring_probe.py /tmp/sf3o
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    corpus_dir = sys.argv[1]

    from dmshadoop_spark.catalog import load_table
    from dmshadoop_spark.dedup import build_occurrence_index, substring_ingest
    from dmshadoop_spark.session import get_spark
    from dmshadoop_spark.workdirs import scratch_dir

    spark = get_spark()
    corpus = load_table(spark, corpus_dir, "documents")
    n_corpus = corpus.count()  # warms the scan too

    # fixed batch: the base-SF documents with ids shifted past the corpus
    batch = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    n_batch = batch.count()

    idx = os.path.join(
        scratch_dir(f"x42_probe_{os.path.basename(corpus_dir)}"), "idx"
    )
    t0 = time.monotonic()
    build_occurrence_index(corpus, idx, min_len=10)
    build_s = time.monotonic() - t0

    t0 = time.monotonic()
    out = substring_ingest(batch, idx, min_len=10, keep="all")
    n_out = out.count()
    ingest_s = time.monotonic() - t0

    print(
        json.dumps(
            {
                "probe": "substring_ingest_scale",
                "corpus_dir": corpus_dir,
                "n_corpus": n_corpus,
                "n_batch": n_batch,
                "n_out": n_out,
                "index_build_s": round(build_s, 3),
                "ingest_s": round(ingest_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
