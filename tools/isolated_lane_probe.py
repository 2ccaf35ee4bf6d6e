"""Isolated bench-lane probe — the settle-a-band-excursion playbook
(round-11 verdict task 1): ONE lane in a fresh process on an idle box,
N warmup passes to absorb codegen/JIT/AQE steady-state, M measured
passes; prints best-of / median / band so the reading compares directly
against the BASELINE.md canonical v2 bands without any in-pass
neighbor's JVM residue (GC pressure, codegen-cache churn, shuffle-dir
cleanup — the "harness crowding" classification an out-of-band in-pass
number needs this probe to earn).

    python tools/isolated_lane_probe.py x35b_semdedup_autok 8 10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    warmup = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    measured = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import run_query
    from dmshadoop_spark.session import get_spark

    load0 = os.getloadavg()[0]
    spark = get_spark(app_name=f"isolated-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(warmup):
        run_query(spark, name, sf_dir)
    times = [round(run_query(spark, name, sf_dir), 4) for _ in range(measured)]
    print(json.dumps({
        "probe": "isolated_lane",
        "lane": name,
        "warmup": warmup,
        "measured": times,
        "best": min(times),
        "median": sorted(times)[len(times) // 2],
        "band": [min(times), max(times)],
        "load_avg_start": round(load0, 2),
        "load_avg_end": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
