"""Dump .explain("formatted") for named queries to plans/<tag>/<name>_<suffix>.txt.

    python tools/dump_plans.py before q8_market_share x36_quality_classifier
    python tools/dump_plans.py after --headline

Runs under the tuned session (the bench's environment) at
$SPARK_GRAFT_SF_DIR (default sf0.1). Queries that do driver-side staging
(iterative trainers, index builds) produce the FINAL returned frame's
plan — the staged jobs are documented in OPTIMIZATION_r12.md instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmshadoop_spark import registry
from dmshadoop_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--headline"]:
        from bench import HEADLINE

        names = list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_TAG", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"dump-plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        p = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(p)
        print(f"wrote {path} ({len(p)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
