"""Z-order (Morton-curve) clustering — multi-dimensional data skipping.

Parquet row-group min/max stats prune a linearly-sorted layout on its
leading sort key ONLY: sorting by (a, b) leaves b's per-file ranges as
wide as the whole domain, so a query filtering on b alone reads every
file. Interleaving the bits of both columns (the Morton/Z curve — the
same layout decision behind Delta Lake's OPTIMIZE ZORDER BY and the
classic UB-tree literature) makes file boundaries axis-aligned boxes in
(a, b) space: EVERY dimension's min/max stays narrow per file, so a
predicate on any subset of the z-columns skips most files at the
footer-stats level, before any row I/O.

Everything here is JVM-side codegen expressions — the min/max
normalization rides the plan as a broadcast 1-row aggregate (no
driver-side .collect()), and the bit-interleave unrolls to shift/and/or
terms. The write itself is `repartitionByRange` on the z-value (range
partitioner ⇒ disjoint z-ranges per file ⇒ disjoint stat boxes) plus a
partition-local sort; at 100 TB that is one extra shuffle at ingest
time, paid back on every selective read thereafter.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(scaled: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each already-scaled long column into
    one Morton code. Column j contributes bit i at position i*k + (k-1-j),
    so the FIRST column occupies the most-significant slot of each group."""
    k = len(scaled)
    if bits * k > 62:
        raise ValueError(f"bits*cols = {bits * k} exceeds a long's capacity")
    parts = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + (k - 1 - j))
        for i in range(bits)
        for j, c in enumerate(scaled)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def with_zvalue(
    df: DataFrame, cols: Sequence[str], bits: int = 16, out: str = "__z"
) -> DataFrame:
    """Append the Morton code of ``cols`` as column ``out``.

    Each column is min/max-normalized to [0, 2^bits) with a broadcast
    1-row aggregate staged into the plan — no driver-side action. NULLs
    and degenerate (min==max) columns map to 0.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"__zmin_{c}"),
            F.max(c).cast("double").alias(f"__zmax_{c}"),
        ]
    staged = df.crossJoin(F.broadcast(df.agg(*aggs)))
    top = float((1 << bits) - 1)
    scaled = []
    for c in cols:
        lo, hi = F.col(f"__zmin_{c}"), F.col(f"__zmax_{c}")
        span = hi - lo
        frac = F.when(span > 0, (F.col(c).cast("double") - lo) / span).otherwise(
            F.lit(0.0)
        )
        scaled.append(
            F.coalesce(F.floor(frac * F.lit(top)), F.lit(0)).cast("long")
        )
    return staged.withColumn(out, zvalue(scaled, bits)).drop(
        *[f"__zmin_{c}" for c in cols], *[f"__zmax_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z curve of ``cols``.

    Range-partitioning on the z-value gives each output file a disjoint
    z-range — i.e. a disjoint box in the clustered dimensions — which is
    exactly what makes footer min/max stats selective on every z-column.
    """
    if n_files is None:
        n_files = df.sparkSession.sparkContext.defaultParallelism
    z = with_zvalue(df, cols, bits)
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
