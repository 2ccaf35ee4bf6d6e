"""DMS-shaped API facade (reference parity layer).

The reference's entire surface is ``class DMS`` in
/root/reference/src/DMS.py — upload/download/update/delete/get_*/search over
HBase + HDFS + Solr. Here the same operations run over one Parquet-backed
``DocumentStore`` (see store.py) with the reference's string-key model
decomposed into typed columns and its documented bugs fixed (SURVEY.md §2
notes B1-B6).
"""

from dmshadoop_spark.dms.extract import extract_metadata, with_extracted_meta
from dmshadoop_spark.dms.store import DOCUMENT_SCHEMA, DocumentStore

__all__ = [
    "DOCUMENT_SCHEMA",
    "DocumentStore",
    "extract_metadata",
    "with_extracted_meta",
]
