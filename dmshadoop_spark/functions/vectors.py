"""Vector math over array<float> embedding columns — pure built-in
higher-order functions (JVM-side, codegen-friendly; no Python in the loop).

Determinism contract: every reduction is an explicit left fold in DOUBLE
(`F.aggregate`), so a DuckDB oracle using the same fold
(`list_reduce(list_prepend(0.0, ...))`) produces bit-identical doubles —
no rounding slop needed for hash comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    """cos = dot / (sqrt(|a|²) * sqrt(|b|²)) — same op order as the oracle."""
    return dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))


# DuckDB SQL fragments implementing the identical folds, for oracle strings.
DUCK_NORM_SQ = (
    "list_reduce(list_prepend(0.0, list_transform(CAST({v} AS DOUBLE[]),"
    " x -> x * x)), (a, b) -> a + b)"
)
DUCK_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip("
    "CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])),"
    " p -> p[1] * p[2])), (x, y) -> x + y)"
)
