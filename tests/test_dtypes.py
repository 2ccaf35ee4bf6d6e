"""Pandas dtype parity between every Spark query and its DuckDB oracle.

The external driver canonicalizes both result sets via pandas before
hashing, so a dtype mismatch (int64 vs float64) can fail the gate even
when the values are identical. Known traps this pins repo-wide:
DuckDB ``SUM(BIGINT)`` returns HUGEINT (→ float64 in pandas) unless cast
back to BIGINT; Spark ``year()``/``rank()``/``size()``/``levenshtein()``
return int32 vs DuckDB's int64.

Runs each side under ``LIMIT 0`` semantics where possible — dtypes come
from the schema mapping, not the data — so the audit stays cheap at any
test SF.
"""

from __future__ import annotations

import pytest

from dmshadoop_spark import registry

registry.load_all()

from tests.oracle_harness import duckdb_connection  # noqa: E402

ORACLE_IDS = sorted(registry.ORACLE)

# datetime64[ns] vs datetime64[us] is benign (round-1 driver passed those
# rows); everything else must match exactly.
_DATETIME_KINDS = ("M",)


@pytest.mark.parametrize("qid", ORACLE_IDS)
def test_pandas_dtype_parity(spark, sf_dir, qid):
    from pyspark.sql.types import DateType

    df = registry.QUERIES[qid](spark, sf_dir)
    date_cols = {f.name for f in df.schema.fields if isinstance(f.dataType, DateType)}
    sdf = df.limit(0).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        ddf = con.execute(
            f"SELECT * FROM ({registry.ORACLE[qid]}) LIMIT 0"
        ).df()
    finally:
        con.close()
    mismatches = []
    for col in sdf.columns:
        s, d = sdf[col].dtype, ddf[col].dtype
        if s.kind in _DATETIME_KINDS and d.kind in _DATETIME_KINDS:
            continue
        # Spark DATE maps to pandas object (datetime.date cells) while
        # DuckDB DATE maps to datetime64 — the round-1 driver passed f9's
        # row with exactly this pairing, so it is benign.
        if col in date_cols and (d.kind in _DATETIME_KINDS or d.kind == "O"):
            continue
        if str(s) != str(d):
            mismatches.append(f"{col}: spark={s} duck={d}")
    assert not mismatches, f"{qid}: " + "; ".join(mismatches)
