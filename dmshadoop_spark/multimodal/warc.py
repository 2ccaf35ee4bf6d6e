"""WARC (Web ARChive, ISO 28500 / WARC 1.0) ingest — pure stdlib.

Web-scale text corpora (Common Crawl and its derivatives) ship as
directories of ``.warc.gz`` files: concatenated WARC records, each
optionally its own gzip member so readers can split at member
boundaries. The Spark-correct shape mirrors the WebDataset tar path:

  * WARC files arrive as ordinary binary rows (binaryFile source) —
    Spark parallelizes over files, which is how crawl archives are
    sized to be consumed (~1 GB per file);
  * ``warc_records`` parses each file WHERE IT SITS (mapInPandas — the
    payload bytes never shuffle) into one row per response record:
    (warc file, target URI, WARC type, HTTP status, content type,
    payload bytes);
  * everything downstream (language ID, quality scoring, dedup — the
    X family) consumes the payload column through the usual pipeline.

Format per the public WARC 1.0 spec: a record is a ``WARC/1.0`` version
line, CRLF-separated named headers (Content-Length is mandatory), a
blank line, ``Content-Length`` bytes of block, then two CRLFs. For
``response`` records the block is an HTTP/1.1 message whose own headers
are split off here. Gzip handling covers both whole-file gzip and the
standard member-per-record layout (zlib streams decoded back-to-back).

``write_warc`` is the deterministic fixture mux (fixed date, md5-derived
record ids, mtime-0 gzip members) so round-trips are digest-stable.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_CRLF = b"\r\n"

RECORD_SCHEMA = (
    "warc string, url string, warc_type string, http_status int, "
    "content_type string, payload binary"
)


def _gunzip_members(data: bytes) -> bytes:
    """Concatenate every gzip member in ``data`` (member-per-record
    layout decodes to the plain concatenated-record stream)."""
    out = bytearray()
    view = memoryview(data)
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(view[pos:])
        out += d.flush()
        tail = len(d.unused_data)
        if tail == 0:
            break
        pos = len(data) - tail
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse a (possibly gzipped) WARC file → one dict per record:
    {url, warc_type, http_status, content_type, payload}. Non-response
    records (warcinfo, request, metadata) surface with http_status /
    content_type / payload of the raw block so nothing is silently
    dropped. Raises ValueError on malformed input."""
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gunzip_members(data)
        except zlib.error as exc:
            raise ValueError(f"bad WARC gzip stream: {exc!r}") from exc
    if not data.startswith(b"WARC/"):
        raise ValueError("not a WARC stream")
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad record header at offset {pos}")
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("truncated WARC headers")
        headers: dict[str, str] = {}
        lines = data[pos:head_end].split(_CRLF)
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("record missing Content-Length") from exc
        block_lo = head_end + 4
        block_hi = block_lo + length
        if block_hi > n:
            raise ValueError("truncated WARC block")
        block = data[block_lo:block_hi]
        rec = {
            "url": headers.get("warc-target-uri"),
            "warc_type": headers.get("warc-type", ""),
            "http_status": None,
            "content_type": headers.get("content-type"),
            "payload": block,
        }
        if rec["warc_type"] == "response" and block[:5] == b"HTTP/":
            http_end = block.find(_CRLF + _CRLF)
            if http_end >= 0:
                http_lines = block[:http_end].split(_CRLF)
                status_parts = http_lines[0].split(b" ", 2)
                if len(status_parts) >= 2 and status_parts[1].isdigit():
                    rec["http_status"] = int(status_parts[1])
                for line in http_lines[1:]:
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-type":
                        rec["content_type"] = v.strip().decode(
                            "ascii", "replace"
                        )
                rec["payload"] = block[http_end + 4 :]
        records.append(rec)
        # records are terminated by two CRLFs
        pos = block_hi
        while data[pos : pos + 2] == _CRLF:
            pos += 2
    return records


def write_warc(
    pages: list[tuple[str, bytes]],
    gzip_per_record: bool = True,
    content_type: str = "text/plain",
) -> bytes:
    """Deterministic WARC fixture mux: one ``response`` record per
    (url, payload), fixed WARC-Date, record ids derived from the url's
    md5 (no randomness), member-per-record gzip when requested (mtime 0,
    so bytes are reproducible)."""
    out = bytearray()
    for url, payload in pages:
        payload = bytes(payload)
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: " + content_type.encode() + _CRLF
            + b"Content-Length: " + str(len(payload)).encode() + _CRLF
            + _CRLF
            + payload
        )
        rid = hashlib.md5(url.encode()).hexdigest()
        head = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">" + _CRLF
            + b"WARC-Date: 2014-04-01T12:00:00Z" + _CRLF
            + b"WARC-Target-URI: " + url.encode() + _CRLF
            + b"Content-Type: application/http;msgtype=response" + _CRLF
            + b"Content-Length: " + str(len(http)).encode() + _CRLF
            + _CRLF
        )
        record = head + http + _CRLF + _CRLF
        if gzip_per_record:
            gz = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out += gz.compress(record) + gz.flush()
        else:
            out += record
    return bytes(out)


def warc_records(
    files: DataFrame, content_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """One row per WARC record, parsed where the bytes sit (mapInPandas,
    Arrow-batched, zero shuffles): (warc, url, warc_type, http_status,
    content_type, payload). Malformed files yield zero rows instead of
    failing the task — corrupt archives surface via a count diff, the
    same posture as the tar/codec family."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "warc", "url", "warc_type", "http_status",
                    "content_type", "payload",
                )
            }
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                if blob is None:
                    continue
                try:
                    recs = parse_warc(bytes(blob))
                except ValueError:
                    continue
                for r in recs:
                    out["warc"].append(path)
                    out["url"].append(r["url"])
                    out["warc_type"].append(r["warc_type"])
                    out["http_status"].append(r["http_status"])
                    out["content_type"].append(r["content_type"])
                    out["payload"].append(r["payload"])
            yield pd.DataFrame(
                {
                    "warc": out["warc"],
                    "url": out["url"],
                    "warc_type": out["warc_type"],
                    "http_status": pd.array(out["http_status"], dtype="Int32"),
                    "content_type": out["content_type"],
                    "payload": out["payload"],
                }
            )

    return files.select(path_col, content_col).mapInPandas(
        work, schema=RECORD_SCHEMA
    )
