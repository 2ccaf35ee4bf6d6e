"""Custom operators: as-of join is covered via the j7 oracle; here the
skew-mitigation helpers are proven semantics-preserving (salting must
never change results, only the shuffle layout)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_asof_join_row_consistency_and_null_propagation(spark):
    """All _asof columns must come from the SAME latest right row: a right
    row carrying a NULL field propagates that NULL rather than mixing in
    an older row's non-NULL value (standard ASOF semantics; regression
    for the per-column last() form)."""
    from dmshadoop_spark.operators import asof_join

    right = spark.createDataFrame(
        [
            ("k", 1, 0, 10, "ten"),
            ("k", 2, 0, 20, None),  # latest before ts=3: b is genuinely NULL
        ],
        "key string, ts int, seq int, a int, b string",
    )
    left = spark.createDataFrame(
        [("k", 3, 1), ("k", 1, 1), ("k", 0, 1)],
        "key string, ts int, seq int",
    )
    rows = {
        r["ts"]: (r["a_asof"], r["b_asof"])
        for r in asof_join(
            left, right, on=["key"], ts="ts", seq="seq",
            value_cols=["a", "b"],
        ).collect()
    }
    assert rows[3] == (20, None)  # one row: NULL b NOT backfilled from ts=1
    assert rows[1] == (10, "ten")
    assert rows[0] == (None, None)  # no preceding right row at all


def test_stem_variants(spark):
    """The light stemmer folds -ing/-ed/-s variants to the base form and
    leaves short/-ss words alone; Spark stem() and STEM_SQL (the DuckDB
    twin) must agree token-for-token."""
    import duckdb

    from dmshadoop_spark.functions.text import STEM_SQL, stem

    words = [
        "orders", "ordered", "ordering", "order", "scans", "scanning",
        "pass", "is", "as", "bed", "sing", "string", "miss", "tables",
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["s"] for r in df.select("w", stem(F.col("w")).alias("s")).collect()}
    assert got["orders"] == "order"
    assert got["ordered"] == "order"
    assert got["ordering"] == "order"
    assert got["scans"] == "scan"
    assert got["scanning"] == "scann"  # minimal stemmer: no double-consonant rule
    assert got["pass"] == "pass"  # -ss protected
    assert got["is"] == "is" and got["as"] == "as"  # too short
    assert got["bed"] == "bed" and got["sing"] == "sing"  # length guards
    expr = STEM_SQL.format(t="w")
    for w in words:
        (dd,) = duckdb.sql(
            f"SELECT {expr} FROM (SELECT '{w}' AS w)"
        ).fetchone()
        assert dd == got[w], w


def test_phrase_search_positions(spark):
    """Positional-index phrase match: counts every occurrence, handles
    repeated-term phrases and overlapping candidates, never matches
    scrambled word order."""
    from dmshadoop_spark.search import phrase_search, positional_index

    docs = spark.createDataFrame(
        [
            (1, "big order scan x big order scan"),   # 2 hits
            (2, "order big scan"),                     # words present, wrong order
            (3, "big order x scan"),                   # gap breaks the phrase
            (4, "go go go"),                           # repeated-term phrase fodder
        ],
        "doc_id long, text string",
    )
    idx = positional_index(docs)
    hits = {r["doc_id"]: r["n_hits"] for r in phrase_search(idx, "big order scan").collect()}
    assert hits == {1: 2}
    rep = {r["doc_id"]: r["n_hits"] for r in phrase_search(idx, "go go").collect()}
    assert rep == {4: 2}  # overlapping occurrences at positions 0 and 1


def test_boolean_search_and_not(spark):
    from dmshadoop_spark.search import boolean_search, positional_index

    docs = spark.createDataFrame(
        [
            (1, "scan join scan"),        # matches, score 3
            (2, "scan join slow"),        # excluded by NOT
            (3, "scan scan scan"),        # missing 'join'
            (4, "join scan"),             # matches, score 2
        ],
        "doc_id long, text string",
    )
    got = [
        (r["doc_id"], r["score"])
        for r in boolean_search(
            positional_index(docs), ["scan", "join"], ["slow"]
        ).collect()
    ]
    assert got == [(1, 3), (4, 2)]


def test_salted_agg_matches_plain(spark, sf_dir):
    from dmshadoop_spark.operators import salted_agg

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = df.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sq"), F.count(F.lit(1)).alias("n")
    )
    salted = salted_agg(
        df,
        ["l_returnflag"],
        [F.sum("l_quantity").alias("sq"), F.count(F.lit(1)).alias("n")],
        [F.sum("sq").alias("sq"), F.sum("n").alias("n")],
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_matches_plain(spark, sf_dir):
    from dmshadoop_spark.operators import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    plain = li.join(orders, ["l_orderkey"])
    salted = salted_join(li, orders, ["l_orderkey"])
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    from dmshadoop_spark.operators import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    # dim with half the keys missing → left join must keep nulls
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    plain = li.join(orders, ["l_orderkey"], "left")
    salted = salted_join(li, orders, ["l_orderkey"], how="left")
    assert sorted(map(lambda r: tuple(str(x) for x in r), plain.collect())) == sorted(
        map(lambda r: tuple(str(x) for x in r), salted.collect())
    )
