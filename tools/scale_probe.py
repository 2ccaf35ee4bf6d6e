"""Scale probe (round-6 verdict task 6): measure the headline queries at
MULTIPLE scale factors in one session and report per-query scaling ratios.

Every scale claim in SCALE.md was design-argued + sf0.1-measured; this
closes the inference gap with a measured 10x point (sf1 = tools/
gen_scale.py over the sf0.1 fixtures — key-shifted replicas, shuffled
document text, rolled embeddings, so join fan-out / group cardinality /
dedup-pair costs scale like a real bigger corpus instead of a naive
copy).

Protocol: leaner than bench.py's canonical 6-pass run (a probe, not the
driver number) — per SF dir: one warmup pass over all queries (AQE
re-plans at the measured size, so warmup must happen per-SF), then
N_PASSES timed passes; report the median. The Arrow-lane queries
(x24/x28/x32/x33) are doc_id-bounded by design and excluded here: their
cost is codec work on a fixed row subset, not SF-scaling.

Usage: python tools/scale_probe.py SF_DIR [SF_DIR...] > BENCH_sf1_probe.json
e.g.:  python tools/scale_probe.py /root/testdata/sf0.1 /tmp/sf1
       python tools/scale_probe.py --queries x2_ngram_jaccard,x35_semdedup \
              /tmp/sf1 /tmp/sf3 /tmp/sf5     # targeted second-decade probe
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmshadoop_spark import registry
from dmshadoop_spark.session import get_spark

registry.load_all()

BOUNDED = {"x24_extract_dispatch", "x28_image_neardup",
           "x32_audio_neardup", "x33_video_neardup"}
# The round-7 iterative trainers are not bench headliners (their wall
# time is driver-synchronized iteration rounds), but their scaling
# exponents ARE the interesting question — fixed iteration counts should
# make both strongly sublinear in SF.
EXTRA = ["x35_semdedup", "x36_quality_classifier"]
N_PASSES = int(os.environ.get("SCALE_PROBE_PASSES", "3"))


def main(argv: list[str]) -> None:
    import argparse

    import bench

    # argparse instead of hand-rolled flag peeling (round-8 ADVICE 4:
    # `--queries` was only recognized as the FIRST positional and
    # IndexError'd when passed without a value).
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dirs", nargs="+", help="SF data dirs, in size order")
    ap.add_argument(
        "--queries",
        help="comma-separated query ids; OVERRIDES the default "
        "HEADLINE-minus-BOUNDED set (i.e. bypasses the BOUNDED "
        "exclusion — a bounded query named here WILL run)",
    )
    ns = ap.parse_args(argv)
    sf_dirs = ns.sf_dirs
    if ns.queries:
        names = ns.queries.split(",")
    else:
        names = [n for n in bench.HEADLINE if n not in BOUNDED]
        # EXTRA predates the round-9 HEADLINE additions — dedupe so a
        # query promoted into HEADLINE isn't probed twice
        names += [n for n in EXTRA if n not in names]
    spark = get_spark(app_name="dmshadoop-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    per_sf: dict[str, dict[str, float]] = {}
    for sf_dir in sf_dirs:
        for n in names:                      # per-SF warmup (AQE re-plans)
            bench.run_query(spark, n, sf_dir)
        runs: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(N_PASSES):
            for n in names:
                runs[n].append(bench.run_query(spark, n, sf_dir))
        per_sf[sf_dir] = {
            n: round(sorted(ts)[N_PASSES // 2], 4) for n, ts in runs.items()
        }
        print(f"# {sf_dir}: total={sum(per_sf[sf_dir].values()):.2f}s",
              file=sys.stderr)

    out: dict = {
        "metric": "scale_probe",
        "unit": "sec",
        "n_passes": N_PASSES,
        "per_sf": per_sf,
        "env": {"load_avg": [round(x, 2) for x in os.getloadavg()],
                "n_cpus": os.cpu_count()},
        "ts_monotonic": round(time.monotonic(), 1),
    }
    if len(sf_dirs) == 2:
        a, b = sf_dirs
        out["ratio"] = {
            n: round(per_sf[b][n] / per_sf[a][n], 2)
            for n in names if per_sf[a][n] > 0
        }
        out["total_ratio"] = round(
            sum(per_sf[b].values()) / sum(per_sf[a].values()), 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
