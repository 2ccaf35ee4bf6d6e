"""Exact-arithmetic helpers for oracle-stable aggregates.

All testdata money columns carry exactly 2 decimal digits (verified against
the parquet), so DECIMAL(18,2) casts are loss-free. Aggregating in DECIMAL
keeps Spark's partial/final aggregation exact and independent of row order —
the only way a distributed sum can hash-match a single-threaded DuckDB sum.
The final ROUND(dec, s) → DOUBLE conversion is a single correctly-rounded
IEEE operation in both engines (scaled integer ≤ 2^53 divided by 10^s), so
the resulting doubles are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"
DEC4 = "decimal(18,4)"


def dec2(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def dec4(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC4)


def money(agg: Column, scale: int = 2) -> Column:
    """Round an exact DECIMAL aggregate and emit a deterministic DOUBLE."""
    return F.round(agg, scale).cast("double")


def exact_avg(c: Column | str, scale: int = 2) -> Column:
    """Order-insensitive average: exact decimal sum / count, both cast to
    double before one IEEE division (identical in Spark and DuckDB)."""
    col = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec2(col)).cast("double") / F.count(F.lit(1)).cast("double"))
