"""Metadata extraction (SURVEY.md §2.11 UD1) — binary content → map.

Reference: ``extract`` (src/DMS.py:70-91) runs hachoir over a temp file and
parses its "- key: value" plaintext lines, keeping only split(':')[1] — which
truncates values containing ':' (bug B4: "Creation date: 2014-04-25
14:22:33" → " 2014-04-25 14"). This reimplementation:

  * splits on the FIRST colon only (B4 fixed);
  * sniffs container formats by magic bytes and pulls image dimensions with
    pure-stdlib parsing (hachoir is Python-2-dead; Pillow isn't in the
    container) — JPEG SOF scan and PNG IHDR;
  * always emits the ingest metadata the reference stored from WebHDFS
    FileStatus (length; src/DMS.py:122,146-155) plus a content hash.

Two surfaces: ``extract_metadata`` (plain Python, used by the DocumentStore
facade on single uploads) and ``with_extracted_meta`` (Arrow-batched pandas
UDF for bulk ingest — the scale path; one Python round-trip per batch, not
per row).
"""

from __future__ import annotations

import hashlib
import json
import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_MAGIC = (
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"%PDF", "application/pdf"),
)


def _sniff(content: bytes) -> str:
    for magic, mime in _MAGIC:
        if content.startswith(magic):
            return mime
    try:
        content.decode("utf-8")
        return "text/plain"
    except (UnicodeDecodeError, AttributeError):
        return "application/octet-stream"


def _jpeg_dimensions(content: bytes) -> tuple[int, int] | None:
    """Walk JPEG segments to the first SOF marker (frame header)."""
    i = 2
    n = len(content)
    while i + 9 < n:
        if content[i] != 0xFF:
            return None
        marker = content[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            height, width = struct.unpack(">HH", content[i + 5 : i + 9])
            return width, height
        seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
        i += 2 + seg_len
    return None


def _png_dimensions(content: bytes) -> tuple[int, int] | None:
    if len(content) >= 24 and content[12:16] == b"IHDR":
        width, height = struct.unpack(">II", content[16:24])
        return width, height
    return None


def extract_metadata(content: bytes) -> dict[str, str]:
    """Binary content → flat string→string metadata map (UD1 contract)."""
    meta: dict[str, str] = {
        "length": str(len(content)),
        "sha256": hashlib.sha256(content).hexdigest(),
    }
    ctype = _sniff(content)
    meta["content_type"] = ctype
    dims = None
    if ctype == "image/jpeg":
        dims = _jpeg_dimensions(content)
    elif ctype == "image/png":
        dims = _png_dimensions(content)
    if dims:
        meta["width"], meta["height"] = str(dims[0]), str(dims[1])
    if ctype == "text/plain":
        text = content.decode("utf-8")
        meta["line_count"] = str(text.count("\n") + 1 if text else 0)
        meta["word_count"] = str(len(text.split()))
        # The reference's "- key: value" convention (src/DMS.py:80-86),
        # split on the FIRST colon only (bug B4 fixed).
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("- ") and ":" in line:
                key, _, value = line[2:].partition(":")
                meta[key.strip()] = value.strip()
    return meta


def _extract_json_fn(content: pd.Series) -> pd.Series:
    """Arrow-batched extraction; emits JSON (decoded to a MAP column by the
    caller) so the UDF return type stays a simple Arrow string."""
    return content.map(
        lambda c: json.dumps(extract_metadata(bytes(c)), sort_keys=True)
        if c is not None
        else None
    )


_extract_json = None


def with_extracted_meta(content_col: Column | str) -> Column:
    """meta MAP<STRING,STRING> column from a BINARY content column."""
    # pandas_udf resolves its return type against the active session, so the
    # wrapper is built lazily on first use rather than at import.
    global _extract_json
    if _extract_json is None:
        _extract_json = pandas_udf(_extract_json_fn, "string")
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    return F.from_json(_extract_json(c), "map<string,string>")
