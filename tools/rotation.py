"""Compute the next correctness-window rotation FROM LIVE STATE.

The round-3 verdict's first action item: the written rotation plan in
registry.py had gone stale (it omitted j11_asof_forward, registered after
the comment was written), so the next window must always be derived as
``set(QUERIES) − cumulative_green`` over every CORRECTNESS_r*.json — never
from a hand-maintained list. This tool prints that set, partitioned the
way PRIORITY orders it (oracle-backed first, then digest-pinned
rows-only), plus any gap between the current PRIORITY and the live state.

Usage: python tools/rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmshadoop_spark import registry  # noqa: E402


def cumulative_green(repo_dir: str) -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            ):
                green.add(name)
            elif (
                # rows-only entries: the driver records err="no_oracle"
                # with the executed row count — that IS their passing
                # state (the weaker check the contract prescribes)
                row.get("err") == "no_oracle"
                and (row.get("spark_rows") or 0) > 0
            ):
                green.add(name)
    return green


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    registry.load_all()
    green = cumulative_green(repo)
    unconf = set(registry.QUERIES) - green
    oracle_unconf = sorted(n for n in unconf if n in registry.ORACLE)
    rows_unconf = sorted(n for n in unconf if n not in registry.ORACLE)
    print(f"registered={len(registry.QUERIES)} oracle={len(registry.ORACLE)}")
    print(f"cumulative_green={len(green)} unconfirmed={len(unconf)}")
    print(f"\noracle-backed unconfirmed ({len(oracle_unconf)}):")
    for n in oracle_unconf:
        print(f'    "{n}",')
    print(f"\nrows-only unconfirmed ({len(rows_unconf)}):")
    for n in rows_unconf:
        print(f'    "{n}",')
    window = list(registry.ordered_queries())[:50]
    stranded = sorted(unconf - set(window))
    print(f"\ncurrent first-50 window covers {len(set(window) & unconf)} "
          f"unconfirmed; stranded outside: {stranded or 'NONE'}")
    return 1 if stranded else 0


if __name__ == "__main__":
    raise SystemExit(main())
