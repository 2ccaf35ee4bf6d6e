"""Local-then-merge top-k — cut the ranking exchange for the k-NN family.

The naive per-query top-k (one row_number window over every scored
candidate) shuffles the ENTIRE candidate set on the query key: for
brute-force scoring that is |corpus|·|queries| rows through one exchange —
the dominant network cost at 100 TB. The standard fix (every distributed
top-k in the literature) is local-then-merge: each partition first keeps
only its own top-k per query, so the exchange carries at most
k·partitions·|queries| rows, independent of corpus size; the global
window then ranks that small remainder exactly.

Correctness: ``local_topk`` truncates per Arrow BATCH (no cross-batch
state needed) — the union of per-batch top-k sets is a superset of the
partition's top-k, which is a superset of the global top-k, and the
downstream global window applies the same deterministic
(order, tie-break) ranking to pick the final rows. Results are therefore
IDENTICAL to the unpruned plan, pinned by the x4/x5 oracles and the ANN
digest tests.

The price is one Arrow hop over the scored set (local memcpy, no
network). On a cluster, network ≫ Arrow; at tiny test SFs the hop can
cost more than the shuffle it saves, so callers may switch it off — the
default stays on because the semantics never change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def local_topk(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_col: str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Keep at most ``k`` rows per key per Arrow batch, ordered by
    (``order_col`` desc-by-default, ``tiebreak_col`` asc) — a pruned
    SUPERSET of the global per-key top-k with the same schema."""
    keys = list(key_cols)
    ascending = [True] * len(keys) + [not descending, True]
    by = keys + [order_col, tiebreak_col]

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) <= k:
                yield pdf
                continue
            yield (
                pdf.sort_values(by, ascending=ascending, kind="mergesort")
                .groupby(keys, sort=False)
                .head(k)
            )

    return df.mapInPandas(prune, schema=df.schema)
