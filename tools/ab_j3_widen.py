"""A/B: does widen() help or hurt j3_inner_join at sf0.1?

Round-2 context: j3's build added widen(lineitem) (commit a28beb7) and the
local single-shot measurement said 1.47s -> 1.0s, but the DRIVER's bench
recorded j3 1.29s (r1) -> 1.89s (r2), the worst headline regression (+46%).
This script settles it under bench.py's own methodology (warm at measured
SF, best-of-3) inside one JVM, interleaving the two variants so host drift
hits both equally, and reports a noise floor (spread of the same variant's
best-of-3 across repeats).

Run:  python tools/ab_j3_widen.py [n_rounds]
Writes ABTEST_j3_widen.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dmshadoop_spark.catalog import load_table, widen
from dmshadoop_spark.functions.numeric import dec2, dec4, money
from dmshadoop_spark.session import get_spark


def build_j3(spark, sf_dir: str, use_widen: bool):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    if use_widen:
        li = widen(li)
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    revenue = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_items"),
        money(F.sum(revenue)).alias("revenue"),
    )


def run_once(spark, sf_dir: str, use_widen: bool) -> float:
    start = time.perf_counter()
    build_j3(spark, sf_dir, use_widen).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-j3-widen")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm both variants (codegen + AQE stats at the measured SF).
    for flag in (True, False):
        run_once(spark, sf_dir, flag)

    # Interleaved measurement: ABBA order per round cancels slow drift.
    samples: dict[str, list[float]] = {"widen": [], "no_widen": []}
    for r in range(n_rounds):
        order = [(True, "widen"), (False, "no_widen")]
        if r % 2:
            order.reverse()
        for flag, key in order:
            samples[key].append(round(run_once(spark, sf_dir, flag), 4))

    def best_of_3_series(xs: list[float]) -> list[float]:
        return [min(xs[i : i + 3]) for i in range(0, len(xs) - 2)]

    result = {
        "sf_dir": sf_dir,
        "n_rounds": n_rounds,
        "samples": samples,
        "best": {k: min(v) for k, v in samples.items()},
        "median": {k: round(statistics.median(v), 4) for k, v in samples.items()},
        # Sliding best-of-3 spread = the noise floor of bench.py's own
        # metric: how much a "best of 3" of the SAME plan moves.
        "best_of_3_spread": {
            k: round(max(b) - min(b), 4)
            for k, v in samples.items()
            if (b := best_of_3_series(v))
        },
    }
    delta = result["best"]["widen"] - result["best"]["no_widen"]
    result["verdict"] = (
        "widen_wins" if delta < -result["best_of_3_spread"]["widen"]
        else "no_widen_wins" if delta > result["best_of_3_spread"]["no_widen"]
        else "within_noise"
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ABTEST_j3_widen.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
