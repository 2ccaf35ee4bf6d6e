"""x39 exact-substring dedup scale probe.

Measures substring_dedup (both keep variants) across the gen_scale.py
fixtures. Default gen_scale replicas SHUFFLE each doc's words per
replica, so 10-token windows never survive across replicas: the
duplicated-span set stays the BASE corpus's (constant removed_tokens /
docs_touched at every factor — the probe output shows it), and what
scales with the factor is the corpus-sized work: the hash scan, the
detection aggregate over all window hashes, and the excision re-read.
That isolates exactly the terms that must stay linear; the marked-
minority stages are held constant by construction. The pipeline has no
pair stage (detection is one map-side-combinable agg on window
hashes), so the exponent should stay ≈1 even when duplication DOES
scale — duplicated-window frequency is absorbed by partial aggregation
before the exchange, unlike the pre-round-9 Jaccard pair emitters.

PROTOCOL: run ONE dir per process (fresh session per point). x39
checkpoints its occurrence table once per execution; repeated
executions in one session accumulate executor-storage blocks until
eviction-recompute storms dominate (measured: sf5 walls 25 → 48 → 92 s
across three same-session passes, stable 28-32 s fresh) — the same
reason the other scale probes are fresh-process-per-point.

Usage:
    python tools/substring_probe.py /tmp/sf1 [--keep first]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from dmshadoop_spark.catalog import load_table
    from dmshadoop_spark.dedup.substring import substring_dedup
    from dmshadoop_spark.session import get_spark

    dirs = [a for a in sys.argv[1:] if not a.startswith("--")]
    keep = "all"
    if "--keep" in sys.argv:
        keep = sys.argv[sys.argv.index("--keep") + 1]
    if not dirs:
        print(__doc__)
        return 2
    spark = get_spark(app_name="substring-probe")
    spark.sparkContext.setLogLevel("ERROR")
    points = []
    for d in dirs:
        docs = load_table(spark, d, "documents")
        n = docs.count()

        def run():
            t = time.perf_counter()
            out = substring_dedup(docs, "doc_id", "text", min_len=10, keep=keep)
            agg = out.agg(
                F.sum("removed_tokens").alias("removed"),
                F.sum("orig_tokens").alias("orig"),
                F.sum((F.col("n_spans") > 0).cast("long")).alias("docs_hit"),
            ).first()
            return time.perf_counter() - t, agg

        run()  # warm
        walls, agg = [], None
        for _ in range(3):
            w, agg = run()
            walls.append(round(w, 2))
        pt = {
            "dir": d,
            "n_docs": n,
            "wall_median_s": statistics.median(walls),
            "walls": walls,
            "removed_tokens": agg["removed"],
            "orig_tokens": agg["orig"],
            "docs_touched": agg["docs_hit"],
        }
        points.append(pt)
        print(json.dumps(pt))
    for a, b in zip(points, points[1:]):
        import math

        exp = math.log(b["wall_median_s"] / a["wall_median_s"]) / math.log(
            b["n_docs"] / a["n_docs"]
        )
        print(
            json.dumps(
                {
                    "from": a["dir"],
                    "to": b["dir"],
                    "wall_exponent": round(exp, 2),
                }
            )
        )
    print(json.dumps({"keep": keep, "points": points}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
