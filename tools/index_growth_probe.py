"""Occurrence-index growth probe (round 12, verdict task 2): pins the
claim that per-batch substring_ingest cost is BOUNDED as the index
grows ~10x, and that bucket pruning is what bounds the small-batch end.

Protocol (fresh process per measured point — the repo's standard probe
discipline; the index persists on disk between steps, so growth and
measurement can live in separate processes):

    IDX=/tmp/idx_growth
    python tools/index_growth_probe.py build  $IDX     # corpus index, NB=256
    python tools/index_growth_probe.py probe  $IDX 0   # measure at 1x
    python tools/index_growth_probe.py grow   $IDX 1 3 # rounds 1..3 appended
    python tools/index_growth_probe.py probe  $IDX 1
    python tools/index_growth_probe.py grow   $IDX 4 9
    python tools/index_growth_probe.py compact $IDX    # fold to 1 file/bucket
    python tools/index_growth_probe.py probe  $IDX 2   # measure at ~10x
    python tools/index_growth_probe.py flatten $IDX    # rebucket NB=1 control
    python tools/index_growth_probe.py probe  $IDX 3   # same probe, no pruning

Two probe regimes per point:

  * tiny_ingest_s — ONE novel doc (~50 tokens => ~40 distinct windows):
    its bucket footprint is ~40/256 of the index, so the probe scan
    reads a bounded fraction regardless of index size. This is the
    steady-state single-document/decontam-point regime.
  * batch_ingest_s — a full 5k-doc novel batch: every bucket is hit, so
    pruning cannot help; boundedness here comes from the batch-side
    work dominating the one sequential pruned-to-everything scan
    (the round-11 flat-ingest result, re-checked at 10x).

Growth rounds append the sf0.1 documents with every token tagged
uniquely per round (regexp), so each round's content is novel and the
index genuinely grows by ~corpus-size occurrences per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BUCKETS = 256
MIN_LEN = 10


def _spark():
    from dmshadoop_spark.session import get_spark

    return get_spark(app_name="index-growth-probe")


def _docs(spark):
    from dmshadoop_spark.catalog import load_table

    return load_table(spark, SF_DIR, "documents")


def _tagged(docs, tag: str, id_shift: int):
    """Every token suffixed with _<tag> => all windows novel."""
    return docs.select(
        (F.col("doc_id") + id_shift).alias("doc_id"),
        F.regexp_replace("text", r"(\S+)", f"$1_{tag}").alias("text"),
    )


def cmd_build(idx: str) -> None:
    from dmshadoop_spark.dedup import build_occurrence_index

    spark = _spark()
    t0 = time.monotonic()
    build_occurrence_index(
        _docs(spark), idx, min_len=MIN_LEN, buckets=BUCKETS
    )
    print(json.dumps({
        "step": "build", "build_s": round(time.monotonic() - t0, 3),
    }))


def cmd_grow(idx: str, lo: int, hi: int) -> None:
    from dmshadoop_spark.dedup import substring_ingest

    spark = _spark()
    docs = _docs(spark)
    for k in range(lo, hi + 1):
        t0 = time.monotonic()
        out = substring_ingest(
            _tagged(docs, f"r{k}", 1_000_000 * k), idx, min_len=MIN_LEN
        )
        n = out.count()
        print(json.dumps({
            "step": "grow", "round": k, "n_out": n,
            "ingest_s": round(time.monotonic() - t0, 3),
        }))


def cmd_compact(idx: str) -> None:
    from dmshadoop_spark.dedup import compact_index, vacuum_index

    spark = _spark()
    t0 = time.monotonic()
    compact_index(spark, idx)
    vacuum_index(idx, keep_last=1)
    print(json.dumps({
        "step": "compact", "compact_s": round(time.monotonic() - t0, 3),
    }))


def cmd_flatten(idx: str) -> None:
    """Re-bucket to NB=1: the no-pruning control (probe must then scan
    the whole index)."""
    from dmshadoop_spark.dedup import compact_index, vacuum_index

    spark = _spark()
    compact_index(spark, idx, buckets=1)
    vacuum_index(idx, keep_last=1)
    print(json.dumps({"step": "flatten"}))


def cmd_probe(idx: str, point: int) -> None:
    from dmshadoop_spark.dedup import read_occurrence_index, substring_ingest
    from dmshadoop_spark.dedup.substring import _occ_meta

    spark = _spark()
    rows = read_occurrence_index(spark, idx).count()
    nb = _occ_meta(idx)["buckets"]
    docs = _docs(spark)

    # tiny regime: one novel doc, measured end to end (probe + append)
    tiny = _tagged(docs.limit(1), f"p{point}t", 500_000_000 + point * 1000)
    t0 = time.monotonic()
    substring_ingest(tiny, idx, min_len=MIN_LEN).count()
    tiny_s = time.monotonic() - t0

    # batch regime: the full 5k-doc novel batch
    batch = _tagged(docs, f"p{point}b", 600_000_000 + point * 1_000_000)
    t0 = time.monotonic()
    substring_ingest(batch, idx, min_len=MIN_LEN).count()
    batch_s = time.monotonic() - t0

    print(json.dumps({
        "step": "probe", "point": point, "index_rows": rows,
        "buckets": nb,
        "tiny_ingest_s": round(tiny_s, 3),
        "batch_ingest_s": round(batch_s, 3),
    }))


def main() -> None:
    cmd, idx = sys.argv[1], sys.argv[2]
    if cmd == "build":
        cmd_build(idx)
    elif cmd == "grow":
        cmd_grow(idx, int(sys.argv[3]), int(sys.argv[4]))
    elif cmd == "compact":
        cmd_compact(idx)
    elif cmd == "flatten":
        cmd_flatten(idx)
    elif cmd == "probe":
        cmd_probe(idx, int(sys.argv[3]))
    else:
        raise SystemExit(f"unknown step {cmd}")


if __name__ == "__main__":
    main()
