"""Deletion-vector vs rewrite delete cost probe (round-10 verdict task 1
"done" criterion: measure delete cost vs the rewrite path at sf0.1).

Builds a DocumentStore from the sf0.1 documents table (optionally
replicated REPL× to show the scaling direction), then times:

  * dv_delete    — store.delete(): tombstone commit, data files
                   hardlinked unchanged (the shipped path)
  * rewrite      — the pre-round-11 path, replayed explicitly:
                   _write_snapshot(df filtered on the key)

The claim under test: rewrite cost grows with corpus size; the
deletion-vector commit does not (its only data-dependent work is the
key-existence probe, a pruned point lookup). Run fresh per scale:

    python tools/dv_probe.py [--repl 1]
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=1)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from dmshadoop_spark.session import get_spark

    spark = get_spark()
    from dmshadoop_spark.dms.store import DocumentStore
    from dmshadoop_spark.workdirs import scratch_dir

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    if args.repl > 1:
        reps = spark.range(args.repl).withColumnRenamed("id", "rep")
        docs = docs.crossJoin(F.broadcast(reps))
    else:
        docs = docs.withColumn("rep", F.lit(0))
    files = docs.select(
        F.concat(
            F.lit("doc-"), F.col("rep"), F.lit("-"), F.col("doc_id")
        ).alias("name"),
        F.encode("text", "UTF-8").alias("content"),
    )

    store = DocumentStore(
        spark, os.path.join(scratch_dir(f"dv_probe_{args.repl}"), "store")
    )
    t0 = time.monotonic()
    n = store.bulk_ingest(files)
    ingest_s = time.monotonic() - t0

    # deletion-vector path: median of 5 single-doc deletes
    dv_times = []
    for i in range(5):
        t0 = time.monotonic()
        assert store.delete(f"doc-0-{100 + i}")
        dv_times.append(time.monotonic() - t0)
    dv_times.sort()

    # commit-only cost (no existence probe): the tombstone write + links
    commit_times = []
    for i in range(3):
        t0 = time.monotonic()
        store._delete_keys([(f"doc-0-{200 + i}", 1)])
        commit_times.append(time.monotonic() - t0)
    commit_times.sort()

    # rewrite path (pre-round-11 delete), replayed once
    t0 = time.monotonic()
    store._write_snapshot(store.df().filter(F.col("name") != "doc-0-200"))
    rewrite_s = time.monotonic() - t0

    lay = store.layout(store.history()[-1])
    print(
        json.dumps(
            {
                "probe": "dv_delete_vs_rewrite",
                "sf_dir": args.sf_dir,
                "repl": args.repl,
                "rows": n,
                "ingest_s": round(ingest_s, 3),
                "dv_delete_median_s": round(dv_times[2], 3),
                "dv_delete_all_s": [round(t, 3) for t in dv_times],
                "dv_commit_only_median_s": round(commit_times[1], 3),
                "rewrite_delete_s": round(rewrite_s, 3),
                "post_rewrite_layout": lay,
            }
        )
    )


if __name__ == "__main__":
    main()
