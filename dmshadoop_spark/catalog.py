"""Testdata catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Plain parquet scan → Catalyst gets full
    pushdown/pruning; nothing is cached or collected here.

    Timestamp normalization: every timestamp column is surfaced as
    TIMESTAMP_NTZ (naive UTC wall time) so results compare bit-for-bit with
    the DuckDB oracle regardless of host time zone. events.ts is stored as
    parquet TIMESTAMP(NANOS), which Spark's reader rejects outright — we use
    the designed escape hatch (nanosAsLong) and rebuild the timestamp at
    microsecond precision (exactly what DuckDB's reader keeps)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # Testdata vintages differ: TIMESTAMP(NANOS) parquet surfaces as
        # BIGINT nanos under nanosAsLong (older driver runs), TIMESTAMP(µs)
        # reads as a timestamp directly (current runs). Normalize both to
        # TIMESTAMP_NTZ µs — exactly what DuckDB's reader keeps.
        from pyspark.sql.types import LongType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # ns → µs with integer division (values exceed double precision),
            # then reinterpret as naive-UTC timestamp.
            # Pure NTZ arithmetic from the epoch — no session-zone dependence
            # (timestamp_micros().cast(ntz) would shift by the session zone).
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        elif isinstance(ts_type, TimestampType):
            df = df.withColumn("ts", F.col("ts").cast(TimestampNTZType()))
        return df
    df = spark.read.parquet(path)
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampType):
            df = df.withColumn(field.name, F.col(field.name).cast(TimestampNTZType()))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql usage)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def widen(df: DataFrame) -> DataFrame:
    """Round-robin repartition a *narrow* small-scan DataFrame to cluster
    width before a CPU-bound expression stage (shingling, hashing,
    signature folds).

    The driver testdata is one single-row-group parquet file per table, so
    the scan yields one partition and every narrow expression would run on
    one core. On a real cluster the scan of a 100 TB table already yields
    thousands of splits and this is a no-op (partitions >= parallelism), so
    the extra shuffle of raw text exists only in the degenerate small-file
    case where it costs nothing.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    splits = _estimated_scan_splits(df)
    if splits is not None and splits < target:
        return df.repartition(target)
    return df


def _parse_byte_conf(value: str) -> int:
    """Parse a Spark byte-size conf string ("134217728b", "128m", "1g")."""
    import re

    m = re.fullmatch(r"(\d+)\s*([kmgt]?)b?", value.strip().lower())
    if not m:
        return 128 * 1024 * 1024
    mult = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    return int(m.group(1)) * mult[m.group(2)]


def _estimated_scan_splits(df: DataFrame) -> int | None:
    """Estimate how many scan partitions ``df``'s file sources will yield,
    WITHOUT building a physical plan or an RDD (``df.rdd`` forces both —
    one full extra analysis/planning pass per widened query at build time).

    ``inputFiles()`` only walks the analyzed plan's leaves. Split count per
    file = ceil(size / maxPartitionBytes) for stat-able local files; remote
    files (hdfs://, s3a://) count as one split each, which is the
    scale-conservative choice: a 100 TB table has thousands of files, the
    estimate clears ``defaultParallelism`` and widen() stays a no-op.
    Returns None if the source exposes no files (e.g. in-memory relation).
    """
    import math
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    max_bytes = _parse_byte_conf(
        str(df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728b"))
    )
    splits = 0
    for f in files:
        parsed = urlparse(f)
        local = parsed.scheme in ("", "file")
        path = parsed.path if parsed.scheme else f
        if local and os.path.exists(path):
            splits += max(1, math.ceil(os.path.getsize(path) / max_bytes))
        else:
            splits += 1
    return splits
