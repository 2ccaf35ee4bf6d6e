"""Incremental aggregate maintenance — materialized-view refresh without
rescanning the base table.

The reference recomputed everything from its stores on each call (e.g.
get_lastest_version re-listed all versions per request, src/DMS.py:385-392).
The Spark-era discipline is the opposite: keep a materialized rollup, and
on each ingest batch fold ONLY the delta in. Two operators:

* ``merge_rollups`` — combine algebraic partial aggregates (sum/count are
  added, min/max take the extremum). Legal for insert-only deltas because
  these aggregates are associative+commutative over disjoint row sets:
  agg(A ∪ B) = agg(A) ⊕ agg(B). Cost: O(|groups|) per input, never
  O(|base rows|).
* ``apply_cdc_to_rollup`` — general change feeds (inserts + deletes +
  updates) via retraction: new = base ⊖ agg(removed rows) ⊕ agg(added
  rows). Only retractable measures qualify (sum, count); min/max are NOT
  retractable under deletes (removing the current extremum needs the
  surviving rows — a recompute of the affected groups, which callers
  should key-filter to the touched group set).

Both are row-identical to a full recompute (pinned by
tests/test_operators.py) — the point is the cost model, not the answer.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_rollups(
    parts: list[DataFrame],
    keys: list[str],
    adds: list[str],
    mins: list[str] | None = None,
    maxs: list[str] | None = None,
) -> DataFrame:
    """Combine algebraic partial rollups over disjoint row sets.

    Every input must carry ``keys`` + all measure columns. The merge is
    one union (no shuffle — inputs are already aggregates, orders of
    magnitude smaller than their source rows) + one partial-aggregated
    groupBy on the keys.
    """
    merged = reduce(lambda a, b: a.unionByName(b), parts)
    aggs = (
        [F.sum(c).alias(c) for c in adds]
        + [F.min(c).alias(c) for c in (mins or [])]
        + [F.max(c).alias(c) for c in (maxs or [])]
    )
    return merged.groupBy(*keys).agg(*aggs)


def apply_cdc_to_rollup(
    rollup: DataFrame,
    removed: DataFrame,
    added: DataFrame,
    keys: list[str],
    adds: list[str],
) -> DataFrame:
    """Fold a change feed into a sum/count rollup by retraction.

    ``removed``/``added`` are ROW-level frames (the before-image of
    deleted+updated rows, and the after-image of inserted+updated rows);
    each measure in ``adds`` must already be a per-row additive value.
    ALWAYS include a count measure (a literal 1 column): groups whose
    measures all reach zero are dropped, so a fully-deleted group
    disappears exactly as a recompute would — and the count column is
    what keeps a surviving group alive when a value measure happens to
    net to zero. Cost: O(|changes| + |groups|)."""
    neg = removed.select(
        *keys, *[(-F.col(c)).alias(c) for c in adds]
    )
    pos = added.select(*keys, *[F.col(c).alias(c) for c in adds])
    delta = neg.unionByName(pos).groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in adds]
    )
    merged = rollup.unionByName(delta).groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in adds]
    )
    alive = reduce(
        lambda a, b: a | b, [F.col(c) != 0 for c in adds]
    )
    return merged.filter(alive)
