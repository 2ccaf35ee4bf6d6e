"""PDF metadata extraction — pure stdlib (document-pipeline surface).

The reference ran hachoir over ANY upload (src/DMS.py:77-79); PDF is the
document format that matters most in practice. This parses the two
metadata surfaces a corpus pipeline needs without a rendering library:

  * the trailer's /Info dictionary (Title/Author/Producer/CreationDate —
    literal and hex string forms, both);
  * the page count — counting ``/Type /Page`` objects, INCLUDING pages
    defined inside FlateDecode-compressed object streams (stdlib zlib);
  * the PDF version from the header.

Everything is a byte scan + regex over object syntax: no xref chasing
(robust to the linearized/incremental-update files where xref tables
lie), bounded work, ValueError on non-PDF payloads.
"""

from __future__ import annotations

import re
import zlib

_INFO_KEYS = {
    b"Title": "pdf_title",
    b"Author": "pdf_author",
    b"Subject": "pdf_subject",
    b"Producer": "pdf_producer",
    b"Creator": "pdf_creator",
    b"CreationDate": "pdf_creation_date",
    b"ModDate": "pdf_mod_date",
}

_LITERAL = re.compile(rb"/(%s)\s*\(((?:[^()\\]|\\.)*)\)" % b"|".join(_INFO_KEYS))
_HEXSTR = re.compile(rb"/(%s)\s*<([0-9A-Fa-f\s]+)>" % b"|".join(_INFO_KEYS))
_PAGE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
_STREAM = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_FLATE = re.compile(rb"/Filter\s*/FlateDecode")


def _decode_pdf_string(raw: bytes) -> str:
    """PDF literal-string unescape (the subset metadata uses) + UTF-16BE
    BOM handling."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == 0x5C and i + 1 < len(raw):  # backslash
            n = raw[i + 1]
            simple = {
                0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C,
            }
            if n in simple:
                out.append(simple[n])
                i += 2
                continue
            if 0x30 <= n <= 0x37:  # octal escape, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < len(raw) and len(oct_digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    oct_digits += bytes([raw[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # lone backslash: skip
            continue
        out.append(c)
        i += 1
    b = bytes(out)
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", "replace")
    return b.decode("latin-1")


def parse_pdf(data: bytes) -> dict[str, str]:
    """{pdf_version, page_count, pdf_title, ...} for a PDF payload."""
    data = bytes(data)
    if data[:5] != b"%PDF-":
        raise ValueError("not a PDF payload")
    meta: dict[str, str] = {}
    header = data[5:13].split()[0] if len(data) > 5 else b""
    version = header.decode("ascii", "replace").rstrip("\r\n")
    meta["pdf_version"] = version[:8]

    for rx, decode in ((_LITERAL, _decode_pdf_string), (_HEXSTR, None)):
        for m in rx.finditer(data):
            key = _INFO_KEYS[m.group(1)]
            if key in meta:
                continue  # first (usually newest-written) wins
            if decode is None:
                hexs = re.sub(rb"\s", b"", m.group(2))
                if len(hexs) % 2:
                    hexs += b"0"
                raw = bytes.fromhex(hexs.decode("ascii"))
                if raw[:2] == b"\xfe\xff":
                    meta[key] = raw[2:].decode("utf-16-be", "replace")
                else:
                    meta[key] = raw.decode("latin-1")
            else:
                meta[key] = decode(m.group(2))

    n_pages = len(_PAGE.findall(data))
    # pages hidden in FlateDecode object streams
    pos = 0
    while True:
        f = _FLATE.search(data, pos)
        if f is None:
            break
        sm = _STREAM.search(data, f.end())
        if sm is None:
            break
        try:
            inflated = zlib.decompress(sm.group(1))
            n_pages += len(_PAGE.findall(inflated))
        except zlib.error:
            pass
        pos = sm.end()
    if n_pages:
        meta["page_count"] = str(n_pages)
    return meta


def encode_pdf(
    n_pages: int = 1,
    title: str | None = None,
    author: str | None = None,
    producer: str | None = None,
) -> bytes:
    """Deterministic minimal valid PDF: catalog + page tree + N empty
    pages + Info dict + xref + trailer. The fixture generator for
    parse_pdf round-trips (and a structurally valid PDF any reader
    opens)."""
    objs: list[bytes] = []
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    for _ in range(n_pages):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>"
        )
    info = b"<<"
    if title:
        info += b" /Title (" + title.encode("latin-1") + b")"
    if author:
        info += b" /Author (" + author.encode("latin-1") + b")"
    if producer:
        info += b" /Producer (" + producer.encode("latin-1") + b")"
    info += b" >>"
    objs.append(info)
    info_num = len(objs)

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Info %d 0 R >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (len(objs) + 1, info_num, xref_off)
    )
    return bytes(out)
