"""Local emulation of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same sf dir and
compares row count, column-name set, and the order-insensitive multiset of
row values (columns sorted by name — the driver's documented comparison).
Values are canonicalized strictly (repr-level for floats) so any
nondeterminism or cross-engine drift fails HERE before it fails at the
driver.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from dmshadoop_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), _canon(x)) for k, x in v.items())
        return "m:{" + ",".join(f"{k}={x}" for k, x in items) + "}"
    return f"s:{v}"


def _rowset(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_canon(row[i]) for i in order) for row in rows)


def run_spark(spark, sf_dir, fn):
    df = fn(spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def run_duck(sf_dir, sql):
    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    return cols, rows


def compare(spark, sf_dir, fn, sql) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    s_cols, s_rows = run_spark(spark, sf_dir, fn)
    d_cols, d_rows = run_duck(sf_dir, sql)
    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
    s_set, d_set = _rowset(s_cols, s_rows), _rowset(d_cols, d_rows)
    if s_set != d_set:
        diff_s = [r for r in s_set if r not in set(d_set)][:3]
        diff_d = [r for r in d_set if r not in set(s_set)][:3]
        problems.append(
            f"values differ; spark-only={diff_s} duck-only={diff_d}"
        )
    return problems
