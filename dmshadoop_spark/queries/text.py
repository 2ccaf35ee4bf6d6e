"""Full-text search — SURVEY.md §2.9 (T1-T5).

The reference's search() delegates tokenize/match/rank to Solr
(src/DMS.py:345-356) and was never finished (README.md:24 "Working on").
Here the whole pipeline is first-class: tokenize → inverted index
(materialized view) → term lookup → TF-IDF ranking → numFound gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dmshadoop_spark.catalog import load_table
from dmshadoop_spark.functions.text import STEM_SQL, tokenize
from dmshadoop_spark.registry import query

QUERY_TERMS = ("spark", "join", "window")


def tokens_df(spark, sf_dir):
    """(doc_id, term) exploded token stream — the T2 building block.

    explode_outer + null-filter on the generated column: an inner explode
    makes InferFiltersFromGenerate push a `size(split(text)) > 0` filter to
    the scan, re-running the split per row."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode_outer(tokenize("text")).alias("term")
    ).filter(F.col("term").isNotNull())


@query(
    "t1_tokenize",
    oracle="""
    SELECT doc_id,
           array_to_string(string_split(text, ' '), '|') AS tokens
    FROM documents
    """,
)
def t1_tokenize(spark, sf_dir):
    """Tokenization as a first-class operator (Solr did this internally).
    Output serialized to a '|'-joined scalar: the driver's canonicalizer
    cannot hash list cells (the round-1 a2 failure mode), and the corpus
    vocabulary contains no '|'. Routes through the repo-wide tokenize()
    contract (functions/text.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.array_join(tokenize("text"), "|").alias("tokens")
    )


@query(
    "t2_inverted_index",
    oracle="""
    SELECT w AS term,
           count(DISTINCT doc_id) AS doc_freq,
           count(*) AS total_tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    """,
)
def t2_inverted_index(spark, sf_dir):
    """The inverted index as a derived table: tokenize → explode → groupBy.
    At 100 TB this materializes once per corpus snapshot; the shuffle is on
    the term key and partial aggregation collapses each partition's token
    stream before the exchange."""
    return tokens_df(spark, sf_dir).groupBy("term").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("total_tf"),
    )


@query(
    "t3_term_lookup",
    oracle="""
    SELECT DISTINCT doc_id
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w = 'spark'
    """,
)
def t3_term_lookup(spark, sf_dir):
    """Single-term lookup (the q= path, src/DMS.py:350)."""
    return (
        tokens_df(spark, sf_dir)
        .filter(F.col("term") == "spark")
        .select("doc_id")
        .distinct()
    )


@query(
    "t4_tfidf_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok
        WHERE term IN {QUERY_TERMS!r}
        GROUP BY doc_id, term
    ),
    dfq AS (
        SELECT term, count(DISTINCT doc_id) AS dfreq FROM tok
        WHERE term IN {QUERY_TERMS!r}
        GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id,
           CAST(ROUND(SUM(tf.tf * ln(CAST(n.n_docs AS DOUBLE)
                                     / CAST(dfq.dfreq AS DOUBLE))), 4)
                AS DOUBLE) AS score
    FROM tf JOIN dfq USING (term) CROSS JOIN n
    GROUP BY tf.doc_id
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def t4_tfidf_topk(spark, sf_dir):
    """TF-IDF ranked top-k — the deterministic stand-in for Solr's relevance
    ranking (SURVEY §2.9 T4). Ordering uses the *rounded* score plus the
    unique doc_id so the cut is stable across engines.

    ONE tokenize pass: document frequency derives from the tf aggregate
    (a count window over each query term's group) instead of a second
    tokenize→distinct branch — an un-cached second branch re-scans and
    re-tokenizes the whole corpus (the q15 exchange-reuse lesson,
    SCALE.md #5). The window partitions are per *query term*, bounded by
    that term's posting-list length — the same bound t2's index build
    carries; corpora where that explodes use the materialized-index path
    (t4b). The n_docs scalar still scans, but prunes to a single column
    and broadcasts one row."""
    from pyspark.sql import Window

    tok = tokens_df(spark, sf_dir)
    qtok = tok.filter(F.col("term").isin(*QUERY_TERMS))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn(
        "dfreq", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    idf = F.log(F.col("n_docs").cast("double") / F.col("dfreq").cast("double"))
    scored = (
        tf.crossJoin(broadcast(n_docs))
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("tf") * idf), 4).cast("double").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


@query(
    "t5_search_numfound",
    oracle=f"""
    SELECT count(DISTINCT doc_id) AS num_found
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w IN {QUERY_TERMS!r}
    """,
)
def t5_search_numfound(spark, sf_dir):
    """numFound — the reference's empty-result gate (src/DMS.py:352)."""
    return (
        tokens_df(spark, sf_dir)
        .filter(F.col("term").isin(*QUERY_TERMS))
        .agg(F.countDistinct("doc_id").alias("num_found"))
    )


# --------------------------------------------------------------------------
# T6-T8 — analyzer features the reference deferred to Solr and never shipped
# (src/DMS.py:350, README.md:24): phrase match, boolean query, stemming.
# --------------------------------------------------------------------------

PHRASE = ("big", "order", "scan")
BOOL_MUST = ("scan", "join")
BOOL_NOT = ("slow",)


@query(
    "t6_phrase_search",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    h AS (
        SELECT doc_id,
               len(list_filter(
                   generate_series(1, len(toks)),
                   i -> toks[i] = '{PHRASE[0]}'
                        AND toks[i + 1] = '{PHRASE[1]}'
                        AND toks[i + 2] = '{PHRASE[2]}'
               )) AS n_hits
        FROM t
    )
    SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits
    FROM h WHERE n_hits > 0
    ORDER BY n_hits DESC, doc_id LIMIT 10
    """,
)
def t6_phrase_search(spark, sf_dir):
    """Exact phrase query answered FROM the positional index
    (search.phrase_search): shift each term's postings by its phrase
    offset and intersect — candidates are the phrase terms' postings
    only. The oracle recomputes hits with a token-window scan, so the two
    radically different implementations must agree on values."""
    from dmshadoop_spark.search import phrase_search, positional_index

    docs = load_table(spark, sf_dir, "documents")
    return phrase_search(positional_index(docs), " ".join(PHRASE), k=10)


@query(
    "t7_boolean_search",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> x = '{BOOL_MUST[0]}'))
                + len(list_filter(toks, x -> x = '{BOOL_MUST[1]}'))
                AS BIGINT) AS score
    FROM t
    WHERE list_contains(toks, '{BOOL_MUST[0]}')
      AND list_contains(toks, '{BOOL_MUST[1]}')
      AND NOT list_contains(toks, '{BOOL_NOT[0]}')
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def t7_boolean_search(spark, sf_dir):
    """Boolean AND/NOT query from the positional index: one aggregation
    over the matching postings (NOT terms ride the same groupBy — no
    anti-join), scored by total tf of the must terms."""
    from dmshadoop_spark.search import boolean_search, positional_index

    docs = load_table(spark, sf_dir, "documents")
    return boolean_search(
        positional_index(docs), list(BOOL_MUST), list(BOOL_NOT), k=10
    )


@query(
    "t8_stemmed_lookup",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS tf
    FROM t WHERE {STEM_SQL.format(t='tok')} = 'order'
    GROUP BY doc_id ORDER BY tf DESC, doc_id LIMIT 20
    """,
)
def t8_stemmed_lookup(spark, sf_dir):
    """Stemmed term lookup: the analyzer normalizes BOTH index terms and
    the query term with the same light stemmer (functions.text.stem ==
    STEM_SQL, kept in lockstep), so 'orders'/'ordered'/'ordering' all hit
    the 'order' postings. The stem CASE runs over every corpus token on
    both engines — any divergence in the stemmer breaks the hash gate."""
    from dmshadoop_spark.functions.text import stem, tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode_outer(tokenize("text")).alias("tok")
    ).filter(F.col("tok").isNotNull())
    # stem the query term with the same expression (constant-folds)
    qstem = F.lit("orders")
    return (
        toks.filter(stem(F.col("tok")) == stem(qstem))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("doc_id", F.col("tf").cast("long").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# T9 — BM25 ranking (the modern default Solr/Lucene scorer; the reference's
# Solr would have used BM25 had search shipped, src/DMS.py:350).
# --------------------------------------------------------------------------

_BM25_TERM_SQL = """
    ln(CAST(1 AS DOUBLE)
       + (CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)
         / (CAST(df{i} AS DOUBLE) + 0.5))
    * (CAST(tf{i} AS DOUBLE) * CAST(2.2 AS DOUBLE))
    / (CAST(tf{i} AS DOUBLE)
       + CAST(1.2 AS DOUBLE)
         * (CAST(0.25 AS DOUBLE)
            + CAST(0.75 AS DOUBLE) * (CAST(dl AS DOUBLE) / avgdl)))
"""


@query(
    "t9_bm25_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS dl,
               {", ".join(
                   f"SUM(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS tf{i}"
                   for i, t in enumerate(QUERY_TERMS)
               )}
        FROM tok GROUP BY doc_id
    ),
    stats AS (
        SELECT count(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
               {", ".join(
                   f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
                   for i in range(len(QUERY_TERMS))
               )}
        FROM per_doc
    ),
    scored AS (
        SELECT doc_id,
               {" + ".join(
                   _BM25_TERM_SQL.format(i=i)
                   for i in range(len(QUERY_TERMS))
               )} AS score
        FROM per_doc CROSS JOIN stats
    )
    SELECT doc_id, CAST(ROUND(score, 4) AS DOUBLE) AS score
    FROM scored WHERE score > 0
    ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 20
    """,
)
def t9_bm25_topk(spark, sf_dir):
    """BM25 ranked retrieval (k1=1.2, b=0.75, Lucene idf) in ONE corpus
    scan. Per-term tf comes from a pivoted conditional-sum aggregate per
    doc (QUERY_TERMS is a bounded query, so the pivot width is fixed), and
    the global stats (N, avgdl, per-term df) are a one-row re-aggregate of
    that same per-doc table: both consumers sit on the identical
    doc_id exchange with no inferred filters on either branch, so
    ReuseExchange runs the scan+tokenize+partial-agg once (the q15 lesson,
    SCALE.md #5 — pinned by test_t9_single_corpus_scan). The one-row stats
    then broadcast back. Ranking rounds to 4dp with a doc_id tie-break —
    the t4 determinism contract — and every float op appears in the same
    order in the oracle."""
    tok = tokens_df(spark, sf_dir)
    tf_cols = [
        F.sum((F.col("term") == t).cast("long")).alias(f"tf{i}")
        for i, t in enumerate(QUERY_TERMS)
    ]
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"), *tf_cols
    )
    df_cols = [
        F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
        for i in range(len(QUERY_TERMS))
    ]
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        *df_cols,
    )
    k1, b = F.lit(1.2), F.lit(0.75)
    def term_score(i: int):
        tf = F.col(f"tf{i}").cast("double")
        dfq = F.col(f"df{i}").cast("double")
        n = F.col("n_docs").cast("double")
        idf = F.log(F.lit(1.0) + (n - dfq + F.lit(0.5)) / (dfq + F.lit(0.5)))
        denom = tf + k1 * (
            F.lit(0.25) + b * (F.col("dl").cast("double") / F.col("avgdl"))
        )
        return idf * (tf * F.lit(2.2)) / denom

    score = term_score(0)
    for i in range(1, len(QUERY_TERMS)):
        score = score + term_score(i)
    scored = per_doc.crossJoin(broadcast(stats)).select(
        "doc_id", score.alias("raw")
    )
    return (
        scored.filter(F.col("raw") > 0)
        .select("doc_id", F.round("raw", 4).cast("double").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "t10_fuzzy_term",
    oracle="""
    WITH vocab AS (
        SELECT t AS term, count(DISTINCT doc_id) AS doc_freq
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
              FROM documents)
        GROUP BY t
    ),
    q AS (SELECT unnest(['hach', 'scann', 'colum']) AS query_term)
    SELECT q.query_term, v.term,
           CAST(levenshtein(q.query_term, v.term) AS BIGINT) AS dist,
           CAST(v.doc_freq AS BIGINT) AS doc_freq
    FROM q JOIN vocab v ON levenshtein(q.query_term, v.term) <= 1
    """,
)
def t10_fuzzy_term(spark, sf_dir):
    """Fuzzy term lookup — Solr's ``term~1`` edit-distance query (the
    analyzer surface the reference's Solr search exposed but its client
    never wired up; README.md:24 "Search (Working on)"). Misspelled query
    terms match vocabulary terms within edit distance 1, each carrying
    its document frequency for ranking.

    Plan: the vocabulary aggregate is the inverted-index build's first
    stage (uniform token shuffle, vocabulary-sized output); the tiny
    query-term set broadcasts and levenshtein runs scan-local over the
    vocabulary — distance computation never touches documents, only the
    ≪corpus term dictionary. (j10 is the scale path when the QUERY side
    is also large: block by prefix/suffix instead of broadcasting.)"""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select("doc_id", F.explode(tokenize("text")).alias("term"))
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("doc_freq"))
    )
    q = spark.createDataFrame(
        [("hach",), ("scann",), ("colum",)], "query_term string"
    )
    return (
        vocab.join(
            broadcast(q),
            F.levenshtein(F.col("query_term"), F.col("term")) <= 1,
        )
        .select(
            "query_term",
            "term",
            F.levenshtein("query_term", "term").cast("long").alias("dist"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
        )
    )


FIELD_QUERY = "lang:en scan fast"


@query(
    "t11_field_scoped_search",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE lang = 'en'
    )
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> x = 'scan'))
                + len(list_filter(toks, x -> x = 'fast'))
                AS BIGINT) AS score
    FROM t
    WHERE list_contains(toks, 'scan') AND list_contains(toks, 'fast')
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def t11_field_scoped_search(spark, sf_dir):
    """Solr field-scoped query syntax — ``q=field:term`` (src/DMS.py:350),
    the one /select feature t3-t10 don't cover. search.parse_query_string
    splits ``lang:en scan fast`` into a column predicate (pushed to the
    scan — partition-prunable when the corpus is laid out by that field)
    plus implicitly-ANDed full-text terms scored by total tf. Scan-local
    except the final top-k."""
    from dmshadoop_spark.search import field_scoped_search

    docs = load_table(spark, sf_dir, "documents")
    return field_scoped_search(docs, FIELD_QUERY, k=10)
