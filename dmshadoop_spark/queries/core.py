"""Scans, projections, filters, sorts, set ops, scalar functions.

SURVEY.md §2.1 (S*), §2.2 (P*), §2.6 (O*), §2.7 (U*), §2.8 (F*).

Each operator is the Spark-first re-expression of a concrete reference
behavior (citations in the docstrings point into /root/reference). The point
of S1-S3/P1-P3 is that Catalyst gives us what the reference lacked: column
pruning (the reference fetched whole rows incl. blobs just to list versions,
src/DMS.py:375-376) and predicate pushdown into the Parquet scan (the
reference's only pushdown was one server-side regex RowFilter,
src/DMS.py:363,373).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmshadoop_spark.catalog import load_table
from dmshadoop_spark.functions.numeric import dec2, dec4, money
from dmshadoop_spark.registry import query

# --------------------------------------------------------------------------
# §2.1 scans / sources
# --------------------------------------------------------------------------


@query(
    "s1_full_scan",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def s1_full_scan(spark, sf_dir):
    """Full table scan — the reference's match-all RowFilter scan
    (src/DMS.py:363-366) as a plain columnar read."""
    return load_table(spark, sf_dir, "documents")


@query(
    "s2_regex_scan",
    oracle="""
    SELECT doc_id, source, lang FROM documents
    WHERE regexp_matches(source, '^src1[0-9]$')
    """,
)
def s2_regex_scan(spark, sf_dir):
    """Regex-filtered scan — the RegexStringComparator pushdown
    (src/DMS.py:373-375), anchored per SURVEY §2 bug note B2. Catalyst
    evaluates the rlike inside the scan stage with column pruning."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("source").rlike("^src1[0-9]$")).select(
        "doc_id", "source", "lang"
    )


@query(
    "s3_point_lookup",
    oracle="SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id = 42",
)
def s3_point_lookup(spark, sf_dir):
    """Point lookup by key — the reference's fetch(key) (src/DMS.py:322-323,
    338-339) with the composite string key decomposed into typed columns, so
    the equality predicate pushes into Parquet row-group stats."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") == 42).select(
        "doc_id", "source", "lang", "n_chars"
    )


@query(
    "s5_blob_point_read",
    oracle="""
    SELECT doc_id, n_chars AS content_length, md5(text) AS content_md5
    FROM documents WHERE doc_id = 7
    """,
)
def s5_blob_point_read(spark, sf_dir):
    """Blob point read (download path, src/DMS.py:192) — verified via
    length + content hash instead of raw bytes, per SURVEY §2 S5."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") == 7).select(
        "doc_id",
        F.col("n_chars").alias("content_length"),
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
    )


@query(
    "s9_json_source",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def s9_json_source(spark, sf_dir):
    """JSON ingestion — the reference parses service JSON ad hoc
    (simplejson.load, src/DMS.py:351); here from a JSON string column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


# --------------------------------------------------------------------------
# §2.2 projections / predicates
# --------------------------------------------------------------------------


@query("p1_project", oracle="SELECT doc_id, source, n_chars FROM documents")
def p1_project(spark, sf_dir):
    """Column-family projection (fetch(key)['meta_data'], src/DMS.py:327) →
    Parquet column pruning; the text/content column never leaves the scan."""
    return load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")


@query(
    "p2_eq_predicate",
    oracle="SELECT doc_id, source FROM documents WHERE lang = 'en'",
)
def p2_eq_predicate(spark, sf_dir):
    """Equality predicate on a typed column (src/DMS.py:114,292)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("lang") == "en").select("doc_id", "source")


@query(
    "p4_null_check",
    oracle="""
    SELECT count(props) AS non_null_props,
           count(*) - count(props) AS null_props
    FROM events
    """,
)
def p4_null_check(spark, sf_dir):
    """Existence / null-check predicate (fetch(key) != None, src/DMS.py:114)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("props").alias("non_null_props"),
        (F.count(F.lit(1)) - F.count("props")).alias("null_props"),
    )


@query(
    "p5_nonempty_guard",
    oracle="""
    SELECT count(*) AS n_matches, count(*) > 0 AS found
    FROM documents WHERE contains(text, 'spark')
    """,
)
def p5_nonempty_guard(spark, sf_dir):
    """numFound == 0 guard on a text match (src/DMS.py:352-355)."""
    docs = load_table(spark, sf_dir, "documents")
    matched = docs.filter(F.col("text").contains("spark"))
    return matched.agg(
        F.count(F.lit(1)).alias("n_matches"),
        (F.count(F.lit(1)) > 0).alias("found"),
    )


# --------------------------------------------------------------------------
# §2.6 sorts / limits / top-k
# --------------------------------------------------------------------------


@query(
    "o1_sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 100
    """,
)
def o1_sort_limit(spark, sf_dir):
    """Global sort + limit (the reference sorts collected lists client-side,
    src/DMS.py:391); Spark plans TakeOrderedAndProject — no full sort, no
    single-node materialization. Tie-break keys make the prefix unique."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .limit(100)
    )


@query(
    "o2_top1",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC LIMIT 1
    """,
)
def o2_top1(spark, sf_dir):
    """Top-1 after sort — the [len-1] indexing at src/DMS.py:392."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.desc("l_shipdate"), F.desc("l_orderkey"), F.desc("l_linenumber")
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .limit(1)
    )


@query(
    "o3_topk",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    ORDER BY n_chars DESC, doc_id LIMIT 10
    """,
)
def o3_topk(spark, sf_dir):
    """Top-k ranked (Solr's default top-10, src/DMS.py:350) with a
    deterministic tie-break on the unique doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .select("doc_id", "n_chars")
        .limit(10)
    )


@query(
    "o4_sort_within_partitions",
    oracle="SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem",
)
def o4_sort_within_partitions(spark, sf_dir):
    """Partition-local sort (no global exchange) — the write-side pattern for
    clustered parquet output. The oracle compares the row *set* (the driver's
    hash is order-insensitive), which partition-local ordering preserves."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.repartition(8, "l_orderkey")
        .sortWithinPartitions("l_shipdate")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


# --------------------------------------------------------------------------
# §2.7 set operations
# --------------------------------------------------------------------------


@query(
    "u1_union_by_name",
    oracle="""
    SELECT c_name AS name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_name AS name, 'supplier' AS kind FROM supplier
    """,
)
def u1_union_by_name(spark, sf_dir):
    """Union of two sources — the reference merges hachoir- and HDFS-metadata
    into one family (two insert loops, src/DMS.py:135-155)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("kind")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
    )
    return cust.unionByName(supp)


@query(
    "u2_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def u2_intersect(spark, sf_dir):
    """INTERSECT (distinct) — nations present on both sides."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@query(
    "u2_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def u2_except(spark, sf_dir):
    """EXCEPT (distinct) — powers the delete-by-key set semantics (J2)."""
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return nat.subtract(supp)


@query(
    "u3_union_distinct",
    oracle="""
    SELECT lang AS val FROM documents
    UNION
    SELECT event_type AS val FROM events
    """,
)
def u3_union_distinct(spark, sf_dir):
    """UNION ALL + distinct = set-semantics union."""
    docs = load_table(spark, sf_dir, "documents").select(F.col("lang").alias("val"))
    ev = load_table(spark, sf_dir, "events").select(F.col("event_type").alias("val"))
    return docs.union(ev).distinct()


@query(
    "u5_bag_set_ops",
    oracle="""
    WITH a AS (SELECT lang AS val FROM documents),
         b AS (SELECT lang AS val FROM documents WHERE doc_id % 3 = 0)
    SELECT 'intersect_all' AS op, val, count(*) AS cnt
    FROM (SELECT val FROM a INTERSECT ALL SELECT val FROM b)
    GROUP BY val
    UNION ALL
    SELECT 'except_all' AS op, val, count(*) AS cnt
    FROM (SELECT val FROM a EXCEPT ALL SELECT val FROM b)
    GROUP BY val
    """,
)
def u5_bag_set_ops(spark, sf_dir):
    """Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL keep
    multiplicities (min/difference of per-value counts), which is what
    dedup accounting actually needs: "how many copies survive" is a bag
    question, the set forms (u2) erase it. Spark's intersectAll/exceptAll
    compile to a count-aggregate + generate replay — no row-by-row
    matching — so both stay one uniform-key shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("lang").alias("val"))
    b = docs.filter(F.col("doc_id") % 3 == 0).select(F.col("lang").alias("val"))
    inter = (
        a.intersectAll(b)
        .groupBy("val")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("intersect_all").alias("op"), "val", "cnt")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("val")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("except_all").alias("op"), "val", "cnt")
    )
    return inter.unionByName(exc)


# --------------------------------------------------------------------------
# §2.8 scalar functions
# --------------------------------------------------------------------------


@query(
    "f1_concat_key",
    oracle="""
    SELECT doc_id,
           'v' || CAST(doc_id % 5 AS VARCHAR) || '.' || source AS dms_key
    FROM documents
    """,
)
def f1_concat_key(spark, sf_dir):
    """Key construction — ''.join(['v',str(v),'.',file]) (src/DMS.py:102)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("v"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("."),
            F.col("source"),
        ).alias("dms_key"),
    )


@query(
    "f2_split",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS first_token,
           string_split(text, ' ')[-1] AS last_token,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def f2_split(spark, sf_dir):
    """Split — the key/metadata deconstruction (src/DMS.py:379,413,83)."""
    docs = load_table(spark, sf_dir, "documents")
    from dmshadoop_spark.functions.text import tokenize

    toks = tokenize("text")
    return docs.select(
        "doc_id",
        toks.getItem(0).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


@query(
    "f3_regexp_extract",
    oracle="""
    SELECT doc_id,
           CAST(regexp_extract(source, '^src([0-9]+)$', 1) AS BIGINT) AS src_num
    FROM documents
    """,
)
def f3_regexp_extract(spark, sf_dir):
    """regexp_extract — the version-from-key split chain (src/DMS.py:379)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("source", "^src([0-9]+)$", 1).cast("long").alias("src_num"),
    )


@query(
    "f4_replace_trim",
    oracle="""
    SELECT doc_id,
           regexp_replace(source, '^src', 'source-') AS renamed,
           ltrim('  ' || lang) AS trimmed
    FROM documents
    """,
)
def f4_replace_trim(spark, sf_dir):
    """replace/trim — .replace('- ','') and .lstrip() (src/DMS.py:84-85)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace("source", "^src", "source-").alias("renamed"),
        F.ltrim(F.concat(F.lit("  "), F.col("lang"))).alias("trimmed"),
    )


@query(
    "f5_cast",
    oracle="""
    SELECT doc_id,
           CAST(CAST(doc_id AS VARCHAR) AS BIGINT) AS id_roundtrip,
           CAST(n_chars AS DOUBLE) AS n_chars_dbl
    FROM documents
    """,
)
def f5_cast(spark, sf_dir):
    """string↔int casts (int(...) src/DMS.py:115; str(...) :102)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("doc_id").cast("string").cast("long").alias("id_roundtrip"),
        F.col("n_chars").cast("double").alias("n_chars_dbl"),
    )


@query(
    "f6_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           count(*) AS cnt
    FROM events GROUP BY 1
    """,
)
def f6_json_extract(spark, sf_dir):
    """JSON field extraction + aggregation (response['numFound'],
    src/DMS.py:351-352)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("long").alias("k_val"))
        .groupBy("k_val")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "f7_map_ops",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys
    FROM events
    """,
)
def f7_map_ops(spark, sf_dir):
    """Map access / keys — the dynamic meta_data family
    (fetch(key)['meta_data'], src/DMS.py:327; .keys() loops :135,146).
    props is parsed into a real MAP column, then accessed."""
    ev = load_table(spark, sf_dir, "events")
    meta = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        meta.getItem("k").alias("k_str"),
        F.size(F.map_keys(meta)).cast("long").alias("n_keys"),
    )


@query(
    "f8_string_funcs",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS text_len,
           contains(text, 'spark') AS has_spark,
           upper(lang) AS lang_uc
    FROM documents
    """,
)
def f8_string_funcs(spark, sf_dir):
    """length / contains / case — needed by the T-tier text ops."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("text_len"),
        F.col("text").contains("spark").alias("has_spark"),
        F.upper("lang").alias("lang_uc"),
    )


@query(
    "f9_date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           count(*) AS cnt
    FROM orders GROUP BY 1, 2, 3
    """,
)
def f9_date_funcs(spark, sf_dir):
    """Date/time functions over o_orderdate (the reference stores
    modificationTime uninterpreted, src/DMS.py:122)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        )
        .groupBy("order_year", "order_month", "month_start")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "f10_hash",
    oracle="""
    SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
    FROM documents WHERE doc_id < 10
    """,
)
def f10_hash(spark, sf_dir):
    """Content hashing — identity for dedup (X1) and round-trip checks."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 10).select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("md5_hex"),
        F.sha2(F.col("text").cast("binary"), 256).alias("sha256_hex"),
    )


@query(
    "f11_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS disc_price
    FROM lineitem
    """,
)
def f11_arith(spark, sf_dir):
    """Price arithmetic in exact DECIMAL, emitted as a deterministic DOUBLE."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money(disc_price).alias("disc_price"),
    )


@query(
    "f12_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[64] AS DOUBLE) AS last_val
    FROM embeddings
    """,
)
def f12_array_funcs(spark, sf_dir):
    """Array functions over the embedding column (float→double widening is
    exact, so values hash-match without rounding)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", 64).cast("double").alias("last_val"),
    )


@query(
    "u4_unpivot",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS sum_price
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM base
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM base
    """,
)
def u4_unpivot(spark, sf_dir):
    """Wide→long unpivot (melt) over an aggregated base — the reshape every
    metrics pipeline needs before a generic (entity, metric, value) sink.
    Spark's unpivot is a scan-local Expand (rows × n_metrics, no shuffle
    beyond the base aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        money(F.sum(dec2("l_quantity"))).alias("sum_qty"),
        money(F.sum(dec2("l_extendedprice"))).alias("sum_price"),
    )
    return base.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price"], "metric", "value"
    )


@query(
    "f13_levenshtein",
    oracle="""
    SELECT CAST(levenshtein(p_brand, 'Brand#33') AS BIGINT) AS edit_dist,
           count(*) AS n_parts
    FROM part GROUP BY 1
    """,
)
def f13_levenshtein(spark, sf_dir):
    """Edit-distance scalar (fuzzy matching / typo clustering) — identical
    dynamic-programming semantics in Spark and DuckDB; grouped to keep the
    output bounded by distinct distances."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy(
        F.levenshtein(F.col("p_brand"), F.lit("Brand#33"))
        .cast("long")
        .alias("edit_dist")
    ).agg(F.count(F.lit(1)).alias("n_parts"))


@query(
    "f14_parse_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' ||
               CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2' AS url
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u
    """,
)
def f14_parse_url(spark, sf_dir):
    """URL decomposition — the domain/path/query extraction every web-
    corpus pipeline runs before domain mixing (x12) or blocklisting.
    Spark's ``parse_url`` (HOST/PATH/QUERY:key) is JVM-side and
    codegen-friendly; the oracle recomputes the same fields with regex,
    so a hash match proves both decompositions agree byte-for-byte on
    synthesized-but-structurally-real URLs."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )
