"""SQ8 scalar quantization for embedding scans — the FAISS
``ScalarQuantizer(QT_8bit)`` layout re-expressed as pure Spark SQL
expressions (JVM-side, codegen; no Python anywhere in encode or scoring).

Each vector is quantized independently: per-vector ``mn = min(v)``,
``scale = (max(v) - min(v)) / 255``, and every dimension becomes an 8-bit
level ``code = floor((x - mn) / scale + 0.5)``.  At rest a vector is
255-level codes + two doubles — 4× smaller than float32 (the codes column
is declared ``array<int>`` here for arithmetic-parity tests; the parquet
storage contract at scale is a fixed-width uint8 byte array).  Scoring is
asymmetric (ADC): the query stays full-precision, candidates are
dequantized on the fly inside the same whole-stage-codegen projection that
folds the dot product — the scan never touches the original float column,
so a 100 TB corpus reads 25 TB.

Determinism contract (functions/vectors.py): every reduction is an explicit
left fold in DOUBLE and quantize/dequantize use only IEEE ops in a fixed
order, so a DuckDB oracle spelling the identical expressions produces
bit-identical doubles — the whole ANN variant is full-value-hash testable,
unlike the seeded-hash LSH/IVF family (rows-only).

Why this exists next to PQ (similarity/pq.py): SQ8 is the no-training,
no-codebook quantizer — encode is a per-row projection (zero shuffles,
no driver state), recall is near-exact because only per-dimension
precision is lost (≤ scale/2 per dim), while PQ trades a k-means training
step for 32× compression. Real pipelines run SQ8 as the default scan
format and PQ for the billion-scale tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dmshadoop_spark.functions.vectors import as_double

SQ8_LEVELS = 255  # 8-bit code book: levels 0..255


def with_sq8(
    df: DataFrame,
    vec_col: str = "v",
    codes_col: str = "codes",
    mn_col: str = "mn",
    scale_col: str = "scale",
) -> DataFrame:
    """Add per-row SQ8 state: ``mn`` (double), ``scale`` (double), and
    ``codes`` (array<int>, values 0..255).  Constant vectors (max == min)
    quantize to all-zero codes with scale 0 and dequantize exactly."""
    v = as_double(vec_col)
    out = df.withColumn("_sq8_v", v)
    out = out.withColumn(mn_col, F.array_min("_sq8_v")).withColumn(
        scale_col,
        (F.array_max("_sq8_v") - F.col(mn_col)) / F.lit(float(SQ8_LEVELS)),
    )
    code = lambda x: F.when(  # noqa: E731
        F.col(scale_col) == 0.0, F.lit(0)
    ).otherwise(
        F.floor((x - F.col(mn_col)) / F.col(scale_col) + F.lit(0.5)).cast("int")
    )
    return out.withColumn(
        codes_col, F.transform("_sq8_v", code)
    ).drop("_sq8_v")


def sq8_dequant(codes: Column, mn: Column, scale: Column) -> Column:
    """array<double> reconstruction: ``mn + code * scale`` per dimension."""
    return F.transform(codes, lambda c: mn + c.cast("double") * scale)


# DuckDB SQL fragments spelling the identical expressions (for oracles).
DUCK_SQ8_MN = "list_reduce(CAST({v} AS DOUBLE[]), (a, b) -> least(a, b))"
DUCK_SQ8_MX = "list_reduce(CAST({v} AS DOUBLE[]), (a, b) -> greatest(a, b))"
DUCK_SQ8_CODES = (
    "list_transform(CAST({v} AS DOUBLE[]), x -> CASE WHEN {scale} = 0.0 "
    "THEN 0 ELSE CAST(floor((x - {mn}) / {scale} + 0.5) AS INT) END)"
)
DUCK_SQ8_DEQUANT = (
    "list_transform({codes}, c -> {mn} + CAST(c AS DOUBLE) * {scale})"
)
