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

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import broadcast

_SIZE_MULT = {"": 1, "b": 1, "k": 1024, "m": 1024**2, "g": 1024**3,
              "t": 1024**4, "p": 1024**5}

_BYTES_RE = re.compile(r"^([+-]?\d+(?:\.\d+)?)\s*([kmgtp]?b?)$")


def _parse_bytes(v: str) -> int:
    """Parse Spark byte-size conf strings ('67108864', '10MB', '-1').

    Single regex match instead of suffix iteration (round-10 ADVICE):
    the old loop tested the bare 'b' suffix before 'kb'/'mb'/'gb', so
    every two-letter form hit float('10m') → ValueError and the caller
    silently fell back to the 10MB default — including user configs
    meant to RESTRICT broadcasting ('1KB'). The multiplier is keyed on
    the unit letter alone ('m' ≡ 'mb', matching Spark's own
    JavaUtils.byteStringAs)."""
    m = _BYTES_RE.match(v.strip().lower())
    if not m:
        raise ValueError(f"not a byte-size string: {v!r}")
    num, unit = m.groups()
    return int(float(num) * _SIZE_MULT[unit.rstrip("b") or unit])


_FIXED_BYTES = [
    (T.BooleanType, 1), (T.ByteType, 1), (T.ShortType, 2),
    (T.IntegerType, 4), (T.DateType, 4), (T.FloatType, 4),
    (T.LongType, 8), (T.DoubleType, 8), (T.TimestampType, 8),
    (T.DecimalType, 16),
]
if hasattr(T, "TimestampNTZType"):
    _FIXED_BYTES.append((T.TimestampNTZType, 8))


def _fixed_width(dt) -> int | None:
    for t, n in _FIXED_BYTES:
        if isinstance(dt, t):
            return n
    return None


def _row_bytes_expr(schema: T.StructType):
    """Column expression estimating one row's in-memory bytes with
    variable-length payloads MEASURED, not defaulted (round-10 ADVICE,
    medium): Catalyst ``defaultSize`` counts an ArrayType as ONE element
    and a StringType as 20 bytes, so ``count() * defaultSize`` under-
    estimated an ``array<double>`` embedding frame ~dim-fold — and the
    explicit ``broadcast()`` wrapper hint_small emits bypasses the
    threshold at runtime, so a 10MB-estimated batch that is really
    hundreds of MB would have been force-broadcast. Fixed-width columns
    use their Catalyst widths; string/binary use ``octet_length``;
    arrays of fixed-width elements use ``size × element-width``; nested
    variable types fall back to JSON length (an over- rather than
    under-estimate — the safe direction for a broadcast decision)."""
    parts = [F.lit(8).cast("long")]  # per-row object overhead
    for f in schema.fields:
        c, dt = F.col(f.name), f.dataType
        fixed = _fixed_width(dt)
        if fixed is not None:
            parts.append(F.lit(fixed).cast("long"))
        elif isinstance(dt, (T.StringType, T.BinaryType)):
            parts.append(
                (F.coalesce(F.octet_length(c), F.lit(0)) + F.lit(16))
                .cast("long")
            )
        elif (
            isinstance(dt, T.ArrayType)
            and _fixed_width(dt.elementType) is not None
        ):
            ew = _fixed_width(dt.elementType)
            parts.append(
                F.coalesce(F.size(c), F.lit(0)).cast("long") * F.lit(ew)
                + F.lit(16)
            )
        elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            parts.append(
                (F.coalesce(F.octet_length(F.to_json(c)), F.lit(0))
                 + F.lit(16)).cast("long")
            )
        else:
            parts.append(F.lit(64).cast("long"))
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    return total


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
    jrdd = jdf.javaRDD()
    fresh = spark._jsparkSession.createDataFrame(jrdd, jdf.schema())
    out = DataFrame(fresh, spark)
    # Partition count of the materialized blocks, captured while the
    # JVM RDD object is in hand (round-13, r12 verdict task 6): callers
    # used to ask `df.rdd.getNumPartitions()` afterwards, which builds a
    # PYTHON-serialized RDD plan — one full extra analysis/planning pass
    # per k-means/logreg call, the exact cost _estimated_scan_splits was
    # written to avoid. getNumPartitions() here is one direct method
    # call on an existing RDD. Read it via materialized_partitions().
    out._ckpt_partitions = int(jrdd.getNumPartitions())
    return out


def materialized_partitions(df: DataFrame, default: int | None = None) -> int:
    """Partition count of a ``stabilize``d frame, read from the count
    captured at checkpoint time — zero planning work. For frames that
    did not come out of ``stabilize`` (or are projections/filters of
    one, which lose the Python-side attribute), returns ``default``
    when given, else falls back to the ``df.rdd`` probe (one extra
    analysis/planning pass — the cost this accessor exists to avoid)."""
    n = getattr(df, "_ckpt_partitions", None)
    if n is not None:
        return int(n)
    if default is not None:
        return int(default)
    return df.rdd.getNumPartitions()


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
    pass ``hint_small=True``: one aggregate over the materialized
    checkpoint blocks sums an honest per-row byte estimate (see
    ``_row_bytes_expr`` — variable-length columns are measured, not
    schema-defaulted), and when it falls under
    ``spark.sql.autoBroadcastJoinThreshold`` the frame comes back
    wrapped in an explicit ``broadcast()`` hint — exactly the decision
    the estimator would have made with honest stats. Leave it False
    (the default) in iterative loops: the extra size job per round
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
            try:
                row = out.agg(
                    F.sum(_row_bytes_expr(out.schema)).alias("b")
                ).collect()[0]
                est = int(row["b"] or 0)
            except Exception:
                # a column type the estimator can't size (e.g. a nested
                # type to_json rejects): NOT hinting is the safe
                # direction — AQE still recovers the broadcast at
                # runtime from actual sizes
                est = thr + 1
            if est <= thr:
                hinted = broadcast(out)
                # the hint wrapper is a new DataFrame object — carry the
                # checkpoint partition count across for
                # materialized_partitions()
                hinted._ckpt_partitions = getattr(
                    out, "_ckpt_partitions", None
                )
                out = hinted
    return out
