"""Scale-probe data generator: expand an existing testdata SF directory
by an integer factor via key-shifted replicas (round-6 verdict task 6 —
every scale claim was design-argued + sf0.1-measured; this gives bench a
10x point without touching the read-only driver fixtures).

Replica design (deliberately NOT naive row duplication, which would
distort the workload):
  * fact/dim tables: every key column shifts by r * (max_key + 1) of its
    own keyspace, so join fan-outs, group cardinalities, and key
    uniqueness scale the way a real bigger TPC-H would (10x orders, 10x
    customers, same dates/status distributions).
  * events: user_id/event_id shift, timestamps unchanged — 10x users in
    the same window range (denser windows, the realistic shape).
  * documents: words are deterministically SHUFFLED per replica (seeded
    permutation). A verbatim copy would plant 10-way exact/near-dup
    groups and blow the pair-emitting dedup queries up quadratically —
    a distortion, not a scale-up. Shuffling preserves token/length/
    frequency statistics (quality + tokenize costs stay honest) while
    destroying shingle overlap (dedup costs stay honest).
  * embeddings: vectors np.roll by r (norm- and distribution-
    preserving, but distinct — no artificial cosine-1.0 clusters).

--open-vocab (round-8 verdict task 2): the base corpus's ~25-word
vocabulary SATURATES the 3-gram shingle space, so under plain scaling
every shingle's df grows ∝ n and the inverted-index pair volume Σdf²
measures quadratic — a fixture artifact, not a plan property (the
round-8 probe's 2.63 exponent). With --open-vocab each replica r > 0
tags every word with its replica id ("word~r"): token COUNTS and
within-replica frequency SHAPE are preserved, but shingles never cross
replicas, so every shingle's df stays AT the base corpus's df no matter
the factor — bounded df by construction, the open-vocab regime real web
corpora live in. Pair volume then grows ∝ factor and the x2 exponent
should measure ~1.

NOT preserved under --open-vocab (review finding — scope the fixture to
the DEDUP tier): tagged words leave the stopword dictionary (every
replica>0 doc gets stopword_ratio 0, collapsing x36's labels and any
stopword/length-derived quality stat) and grow ~2-3 chars. Probe
x2/x35-family queries on *o fixtures; quality-tier scaling (x3/x36)
belongs on the plain key-shifted fixtures.

Usage: python tools/gen_scale.py SRC_DIR DEST_DIR FACTOR [--open-vocab]
e.g.:  python tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf1 10
       python tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf1o 10 --open-vocab
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def _shift_keys(tbl: pa.Table, keys: list[str], spans: dict[str, int],
                r: int) -> pa.Table:
    for k in keys:
        col = tbl[k].to_numpy(zero_copy_only=False) + r * spans[k]
        tbl = tbl.set_column(
            tbl.schema.get_field_index(k), tbl.schema.field(k),
            pa.array(col, type=tbl.schema.field(k).type),
        )
    return tbl


def _mutate_documents(tbl: pa.Table, r: int, open_vocab: bool = False) -> pa.Table:
    if r == 0:
        return tbl
    rng = np.random.default_rng(42_000 + r)
    texts = tbl["text"].to_pylist()
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        words = t.split(" ")
        rng.shuffle(words)
        if open_vocab:
            # replica-tagged tokens: shingles can never cross replicas,
            # so df stays at the base corpus's level for any factor
            words = [f"{w}~{r}" for w in words]
        out.append(" ".join(words))
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), tbl.schema.field("text"),
        pa.array(out, type=pa.string()),
    )
    n_chars = pa.array(
        [len(t) if t is not None else None for t in out], type=pa.int64()
    )
    return tbl.set_column(
        tbl.schema.get_field_index("n_chars"), tbl.schema.field("n_chars"),
        n_chars,
    )


def _mutate_embeddings(tbl: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return tbl
    vecs = tbl["embedding"].to_pylist()
    rolled = [
        None if v is None else np.roll(np.asarray(v), r).tolist()
        for v in vecs
    ]
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"),
        tbl.schema.field("embedding"),
        pa.array(rolled, type=tbl.schema.field("embedding").type),
    )


def main(src: str, dest: str, factor: int, open_vocab: bool = False) -> None:
    import os

    os.makedirs(dest, exist_ok=True)
    for name in COPY_ONLY:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{dest}/{name}.parquet")
        print(f"{name}: copied")
    for name, keys in KEY_COLS.items():
        base = pq.read_table(f"{src}/{name}.parquet")
        spans = {
            k: int(base[k].to_numpy(zero_copy_only=False).max()) + 1
            for k in keys
        }
        replicas = []
        for r in range(factor):
            t = _shift_keys(base, keys, spans, r)
            if name == "documents":
                t = _mutate_documents(t, r, open_vocab)
            elif name == "embeddings":
                t = _mutate_embeddings(t, r)
            replicas.append(t)
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{dest}/{name}.parquet")
        print(f"{name}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--open-vocab"]
    main(args[0], args[1], int(args[2]), "--open-vocab" in sys.argv[1:])
