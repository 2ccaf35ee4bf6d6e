"""Lineage stabilization with an operable reliability switch (round-8
verdict task 5).

Every iterative operator in this repo (connected components, PageRank,
logistic-regression training, the bigram-LM model table, the JL+SQ8
candidate index) must truncate lineage between rounds — without it each
round RE-EXECUTES the caller's whole upstream plan (the round-7 sf1
probe measured x35's 24-second pair subtree re-run ~10 times).

Two ways to truncate, one trade:

  * ``localCheckpoint`` — blocks live on executor local storage. No
    distributed-FS round-trip (strictly better in local mode and for
    bounded test SFs), but losing an executor mid-run makes the job
    unrecoverable.
  * reliable ``checkpoint`` — blocks go to ``spark.sparkContext``'s
    checkpoint dir (HDFS/object store on a cluster). Survives executor
    loss; costs a write+read of the checkpointed data.

Until round 9 the trade lived in docstrings ("a cluster run should set a
checkpoint dir and use reliable .checkpoint()") with no code path that
actually switched. ``stabilize`` IS that switch: call
``sc.setCheckpointDir(...)`` once per session (the standard Spark knob —
no new config invented) and every stabilization site in the repo
upgrades to the reliable form; leave it unset and the executor-local
fast path is used. Results are identical either way — both forms
materialize the same rows; only the storage (and recoverability) of the
truncation point differs.

Disk lifecycle on the reliable path: checkpoint files are NOT deleted
by default when the RDD goes out of scope, and the iterative loops here
write one per round (connected components: up to ~27 per call). Set
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` alongside the
dir — deploy.YARN_CONF ships it — so files are reclaimed as each
round's RDD is GC'd; otherwise budget the dir for (rounds × dataset)
copies per job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast

_SIZE_SUFFIX = {"b": 1, "k": 1024, "m": 1024**2, "g": 1024**3}


def _parse_bytes(v: str) -> int:
    """Parse Spark byte-size conf strings ('67108864', '10MB', '-1')."""
    s = v.strip().lower()
    for suf, mult in _SIZE_SUFFIX.items():
        if s.endswith(suf + "b") and suf != "b":
            return int(float(s[: -len(suf) - 1]) * mult)
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * mult)
    return int(float(s))


def _strip_stats(df: DataFrame) -> DataFrame:
    """Rebuild ``df`` on its own JVM row RDD, discarding the logical
    plan statistics the checkpoint preserved.

    Why this exists (round-9 finding, root-caused with thread dumps +
    per-round digit counts — SCALE.md "Exponential planner stall"):
    ``Dataset.checkpoint``/``localCheckpoint`` carries the optimized
    plan's ``Statistics`` into the resulting ``LogicalRDD``, and the
    size-only estimator MULTIPLIES child ``sizeInBytes`` at every join.
    An iterative loop that joins two frames derived from the previous
    round's checkpoint therefore SQUARES the BigInt estimate each round
    — its digit count doubles (measured: 76 → 190 → 417 → 870 → 1777 →
    3591 over six rounds of the component loop), and by round ~15 every
    plan compile and AQE decision is doing arithmetic on million-digit
    BigInts: wall clock ×2.5 per round with constant data, plans,
    stages, and tasks (the component loop hit 33 s/round on 3 451
    edges). Rebuilding via the PUBLIC ``createDataFrame(JavaRDD[Row],
    schema)`` yields a fresh LogicalRDD whose stats are the bounded
    session default (19 digits) — measured flat 0.4-0.5 s/round with
    bit-identical results. All JVM-side: no Python round-trip, no disk;
    the cost is one InternalRow↔Row conversion per scan of the
    checkpointed data. Runtime join strategy is unaffected where it
    matters: explicit broadcast() hints are preserved by downstream
    plans, and AQE re-plans from ACTUAL runtime sizes, not these
    estimates."""
    # .toDF() coerces a TYPED Dataset (spark.range → Dataset[Long]) to
    # Dataset[Row] — javaRDD() on the typed form yields bare Longs that
    # the Row encoder rejects. The schema (incl. nullability) is
    # preserved verbatim.
    jdf = df._jdf.toDF()
    spark = df.sparkSession
    fresh = spark._jsparkSession.createDataFrame(jdf.javaRDD(), jdf.schema())
    return DataFrame(fresh, spark)


def stabilize(
    df: DataFrame, eager: bool = True, hint_small: bool = False
) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint()`` when the
    session has a checkpoint dir set (``sc.setCheckpointDir``), else
    ``localCheckpoint()``. Same rows either way — the switch picks
    where the materialized blocks live (recoverable storage vs executor
    memory/disk). The checkpointed frame is then rebuilt WITHOUT the
    plan statistics the checkpoint preserves — see ``_strip_stats``:
    carried stats compound multiplicatively through iterative join
    loops until BigInt arithmetic dominates the driver.

    KNOWN TRADE (round-9 ADVICE): the rebuilt frame's ``sizeInBytes``
    is the session default (~Long.MaxValue), so COMPILE-TIME
    auto-broadcast will never pick a stabilized frame as the small join
    side — only explicit ``broadcast()`` hints and AQE's runtime
    re-plan (both enabled in this repo's session) recover it. For
    small, dimension-like frames that feed joins after stabilization,
    pass ``hint_small=True``: the materialized row count (one cheap
    scan of the checkpoint blocks) × the schema's Catalyst
    ``defaultSize`` gives a bounded estimate, and when it falls under
    ``spark.sql.autoBroadcastJoinThreshold`` the frame comes back
    wrapped in an explicit ``broadcast()`` hint — exactly the decision
    the estimator would have made with honest stats. Leave it False
    (the default) in iterative loops: the extra count job per round
    costs more than a compile-time hint AQE would re-derive anyway."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        out = _strip_stats(df.checkpoint(eager=eager))
    else:
        out = _strip_stats(df.localCheckpoint(eager=eager))
    if hint_small and eager:
        try:
            thr = _parse_bytes(
                df.sparkSession.conf.get(
                    "spark.sql.autoBroadcastJoinThreshold", "10485760"
                )
            )
        except ValueError:
            thr = 10 * 1024**2
        if thr > 0:
            est = out.count() * out._jdf.schema().defaultSize()
            if est <= thr:
                out = broadcast(out)
    return out
