"""dmshadoop_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference DMS system (lukkiddd/DMSHadoop),
re-expressed Spark-first, plus large-scale LLM-data-pipeline operators.

The reference (``/root/reference/src/DMS.py``) is a versioned document store
over HBase + HDFS + Solr. This package maps its data model onto a single
columnar ``documents`` table (Parquet) and decomposes every reference
operation into declarative DataFrame plans that Catalyst can optimize
(predicate pushdown, column pruning, broadcast joins, AQE) — see SURVEY.md.

Layout:
    session       tuned SparkSession factory
    catalog       testdata table loading / temp-view registration
    registry      the queries()/oracle_sql() registry the driver consumes
    queries/      operator inventory implementations (SURVEY.md §2 IDs)
    dms/          the DMS-shaped API facade (upload/download/search/...)
    functions/    reusable column-expression builders (text, vectors, hashing)
    dedup/        exact + MinHash-LSH + SimHash + n-gram Jaccard dedup
    similarity/   embedding k-NN (brute force + LSH-bucketed)
    streaming/    Structured Streaming forms of the ST* operators
    multimodal/   binary-column ingest + decode plumbing (stubs for codecs)
"""

__version__ = "0.1.0"
