"""Noise measurement closing the round-3 verdict's item 5: are the two
headline queries still above their round-1 bests (j3 1.54 vs 1.29, q21
1.38 vs 1.20) because of a plan regression, or within run-to-run spread?

Method: bench.py's own protocol (warm at the measured SF, then timed
repeats) inside one JVM, the two queries interleaved so host drift hits
both equally. The question is settled by SPREAD: if each query's observed
min..max band at n repeats contains its round-1 number, the gap is
protocol/host noise, not a regression (r1 also ran a different protocol —
single-shot cold — so its per-query numbers carry their own bias).

Run:  python tools/noise_j3_q21.py [n_repeats]
Writes NOISE_j3_q21.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmshadoop_spark import registry
from dmshadoop_spark.session import get_spark

registry.load_all()

QUERIES = {"j3_inner_join": 1.29, "q21_waiting_supplier": 1.20}  # r1 bests


def run_once(spark, name: str, sf_dir: str) -> float:
    start = time.perf_counter()
    registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - start


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="noise-j3-q21")
    spark.sparkContext.setLogLevel("ERROR")

    for name in QUERIES:  # warm: codegen + AQE decisions at measured SF
        run_once(spark, name, sf_dir)

    samples: dict[str, list[float]] = {name: [] for name in QUERIES}
    for _ in range(n):
        for name in QUERIES:
            samples[name].append(round(run_once(spark, name, sf_dir), 4))

    out = {"sf_dir": sf_dir, "n_repeats": n, "samples": samples, "stats": {}}
    for name, r1_best in QUERIES.items():
        xs = samples[name]
        stats = {
            "min": min(xs),
            "median": round(statistics.median(xs), 4),
            "max": max(xs),
            "r1_single_shot": r1_best,
            "r3_best_of_3": {"j3_inner_join": 1.536,
                             "q21_waiting_supplier": 1.3805}[name],
            "r1_within_spread": min(xs) <= r1_best <= max(xs)
            or min(xs) <= r1_best,
        }
        out["stats"][name] = stats

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "NOISE_j3_q21.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["stats"], indent=2))
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
