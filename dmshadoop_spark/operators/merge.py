"""MERGE INTO — the Delta/Iceberg upsert-delete primitive as ONE plan.

``s8_overwrite_upsert`` covers the plain upsert (anti-join ∪ replacement);
real ingest pipelines need full MERGE semantics — matched-update,
matched-delete, not-matched-insert in a single statement — and plain
Spark has no MERGE until it targets a Delta/Iceberg table. This operator
is that statement as a composition: one full-outer join on the key
columns + one CASE projection, so the whole merge costs exactly one
shuffle per side (AQE broadcasts a small delta automatically), never a
rewrite-per-clause.

SQL MERGE requires at most ONE source row per target key;
``validate_unique_source=True`` enforces it with a single count-distinct
aggregate over the (small) source side and raises before any output is
produced — the Delta runtime behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_T, _S = "__mrg_t", "__mrg_s"


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    matched_update: dict[str, Column] | None = None,
    matched_delete: Column | None = None,
    insert_not_matched: bool = True,
    validate_unique_source: bool = False,
) -> DataFrame:
    """Return the post-MERGE snapshot of ``target``.

    * key matched and ``matched_delete`` (evaluated over the joined row)
      is true → row dropped;
    * key matched otherwise → target row with ``matched_update``
      expressions applied (default: replace every target column with the
      source's same-named column when present);
    * source-only key → inserted (``insert_not_matched``);
    * target-only key → kept unchanged.

    ``matched_update`` values and ``matched_delete`` may reference the
    two sides via the aliases ``__mrg_t`` and ``__mrg_s`` (e.g.
    ``F.col("__mrg_s.qty") + F.col("__mrg_t.qty")``); plain column names
    in source/target work for the common cases.
    """
    if validate_unique_source:
        dup = (
            source.groupBy(*on)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key = {k: dup[0][k] for k in on}
            raise ValueError(f"MERGE source has duplicate key {key}")

    # Presence markers, not key-nullness: the join is eqNullSafe, so a
    # NULL target key CAN match a NULL source key — classifying on
    # key.isNull() misread that as target-only and silently dropped the
    # update (round-4 ADVICE). A non-nullable lit(True) per side survives
    # the full-outer join as NULL exactly when that side is absent.
    t = target.withColumn("__t_present", F.lit(True)).alias(_T)
    s = source.withColumn("__s_present", F.lit(True)).alias(_S)
    cond = [F.col(f"{_T}.{k}").eqNullSafe(F.col(f"{_S}.{k}")) for k in on]
    joined = t.join(s, cond, "full_outer")

    t_present = F.col(f"{_T}.__t_present").isNotNull()
    s_present = F.col(f"{_S}.__s_present").isNotNull()
    matched = t_present & s_present
    target_only = ~s_present

    out_cols = []
    for c in target.columns:
        s_val = (
            F.col(f"{_S}.{c}") if c in source.columns else F.lit(None)
        )
        if matched_update is not None and c in matched_update:
            upd = matched_update[c]
        elif c in source.columns:
            upd = F.col(f"{_S}.{c}")
        else:
            upd = F.col(f"{_T}.{c}")
        out_cols.append(
            F.when(target_only, F.col(f"{_T}.{c}"))
            .when(matched, upd)
            .otherwise(s_val)  # source-only insert
            .alias(c)
        )

    keep = F.when(
        matched,
        ~matched_delete if matched_delete is not None else F.lit(True),
    ).otherwise(
        F.when(target_only, F.lit(True)).otherwise(
            F.lit(bool(insert_not_matched))
        )
    )
    return joined.filter(keep).select(*out_cols)
