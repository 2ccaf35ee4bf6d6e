"""Minimal EBML/Matroska (mkv/webm) metadata demux — pure stdlib.

The hachoir-parity surface the reference exposed for any upload
(src/DMS.py:77-79) needs container METADATA, not media decode: duration,
timescale, per-track codec ids, video dimensions, audio rates. That is
an EBML varint walk over Segment → Info/Tracks — no codec library — so
the "mkv remains stubbed" boundary (round-2/3 status) shrinks to the
media BLOCKS only (Clusters are skipped; decoding their payloads would
need ffmpeg-class codecs).

Element ids from the public Matroska/EBML RFCs (RFC 8794 + the Matroska
element registry). ``encode_mkv_skeleton`` writes the same structure for
round-trip tests — metadata-only (no Clusters), spec-valid varints.
"""

from __future__ import annotations

import struct

# Matroska element ids (RFC 8794 / Matroska registry), marker bits kept
EBML_HEADER = 0x1A45DFA3
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
DURATION = 0x4489
MUXING_APP = 0x4D80
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQUENCY = 0xB5
CHANNELS = 0x9F
DOC_TYPE = 0x4282

_TRACK_TYPES = {1: "video", 2: "audio", 17: "subtitle"}


def _read_vint(data: bytes, i: int, keep_marker: bool) -> tuple[int, int]:
    """Read one EBML variable-length integer at offset i → (value, next)."""
    if i >= len(data):
        raise ValueError("EBML: truncated varint")
    first = data[i]
    if first == 0:
        raise ValueError("EBML: invalid varint lead byte 0x00")
    length = 8 - first.bit_length() + 1
    if i + length > len(data):
        raise ValueError("EBML: truncated varint body")
    value = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for b in data[i + 1 : i + length]:
        value = (value << 8) | b
    return value, i + length


def _walk(data: bytes, lo: int, hi: int):
    """Yield (element_id, payload_lo, payload_hi) for EBML children."""
    i = lo
    while i < hi:
        eid, i = _read_vint(data, i, keep_marker=True)
        size, i = _read_vint(data, i, keep_marker=False)
        end = min(i + size, hi)
        yield eid, i, end
        i = end


def _uint(data: bytes, lo: int, hi: int) -> int:
    v = 0
    for b in data[lo:hi]:
        v = (v << 8) | b
    return v


def _float(data: bytes, lo: int, hi: int) -> float:
    n = hi - lo
    if n == 4:
        return struct.unpack(">f", data[lo:hi])[0]
    if n == 8:
        return struct.unpack(">d", data[lo:hi])[0]
    raise ValueError(f"EBML: float of width {n}")


def parse_mkv(data: bytes) -> dict:
    """Matroska metadata: {doc_type, timescale_ns, duration (seconds),
    tracks: [{number, type, codec, width?, height?, sample_rate?,
    channels?}]}. Raises ValueError on malformed/non-EBML payloads."""
    data = bytes(data)
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML payload")
    doc_type = None
    timescale = 1_000_000  # Matroska default: 1 ms in ns
    duration_units = None
    tracks: list[dict] = []
    try:
        for eid, lo, hi in _walk(data, 0, len(data)):
            if eid == EBML_HEADER:
                for ceid, clo, chi in _walk(data, lo, hi):
                    if ceid == DOC_TYPE:
                        doc_type = data[clo:chi].rstrip(b"\x00").decode(
                            "ascii", "replace"
                        )
            elif eid == SEGMENT:
                for seid, slo, shi in _walk(data, lo, hi):
                    if seid == INFO:
                        for ieid, ilo, ihi in _walk(data, slo, shi):
                            if ieid == TIMESTAMP_SCALE:
                                timescale = _uint(data, ilo, ihi)
                            elif ieid == DURATION:
                                duration_units = _float(data, ilo, ihi)
                    elif seid == TRACKS:
                        for teid, tlo, thi in _walk(data, slo, shi):
                            if teid != TRACK_ENTRY:
                                continue
                            tr: dict = {}
                            for feid, flo, fhi in _walk(data, tlo, thi):
                                if feid == TRACK_NUMBER:
                                    tr["number"] = _uint(data, flo, fhi)
                                elif feid == TRACK_TYPE:
                                    t = _uint(data, flo, fhi)
                                    tr["type"] = _TRACK_TYPES.get(t, str(t))
                                elif feid == CODEC_ID:
                                    tr["codec"] = data[flo:fhi].rstrip(
                                        b"\x00"
                                    ).decode("ascii", "replace")
                                elif feid == VIDEO:
                                    for veid, vlo, vhi in _walk(data, flo, fhi):
                                        if veid == PIXEL_WIDTH:
                                            tr["width"] = _uint(data, vlo, vhi)
                                        elif veid == PIXEL_HEIGHT:
                                            tr["height"] = _uint(data, vlo, vhi)
                                elif feid == AUDIO:
                                    for aeid, alo, ahi in _walk(data, flo, fhi):
                                        if aeid == SAMPLING_FREQUENCY:
                                            tr["sample_rate"] = _float(
                                                data, alo, ahi
                                            )
                                        elif aeid == CHANNELS:
                                            tr["channels"] = _uint(
                                                data, alo, ahi
                                            )
                            tracks.append(tr)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed EBML stream: {exc!r}") from exc
    duration = (
        duration_units * timescale / 1e9 if duration_units is not None else None
    )
    return {
        "doc_type": doc_type,
        "timescale_ns": timescale,
        "duration": duration,
        "tracks": tracks,
    }


def _vint_id(eid: int) -> bytes:
    out = []
    while eid:
        out.append(eid & 0xFF)
        eid >>= 8
    return bytes(reversed(out))


def _vint_size(n: int) -> bytes:
    """Encode a size with the marker bit (1-4 bytes is plenty here)."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            marker = 1 << (8 - length)
            raw = n | (marker << (8 * (length - 1)))
            return raw.to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _elem(eid: int, payload: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(payload)) + payload


def _uint_payload(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def encode_mkv_skeleton(
    duration_ms: float,
    video: tuple[int, int] | None = None,
    audio: tuple[int, int] | None = None,
) -> bytes:
    """Deterministic metadata-only Matroska: EBML header + Segment with
    Info (1 ms timescale, float duration) and Tracks (optional video
    (w, h) as V_UNCOMPRESSED, optional audio (rate, channels) as
    A_PCM/INT/LIT). No Clusters — the structure parse_mkv reads."""
    header = _elem(
        EBML_HEADER, _elem(DOC_TYPE, b"matroska")
    )
    info = _elem(
        INFO,
        _elem(TIMESTAMP_SCALE, _uint_payload(1_000_000))
        + _elem(DURATION, struct.pack(">d", float(duration_ms)))
        + _elem(MUXING_APP, b"dmshadoop"),
    )
    entries = b""
    number = 1
    if video is not None:
        w, h = video
        entries += _elem(
            TRACK_ENTRY,
            _elem(TRACK_NUMBER, _uint_payload(number))
            + _elem(TRACK_TYPE, _uint_payload(1))
            + _elem(CODEC_ID, b"V_UNCOMPRESSED")
            + _elem(
                VIDEO,
                _elem(PIXEL_WIDTH, _uint_payload(w))
                + _elem(PIXEL_HEIGHT, _uint_payload(h)),
            ),
        )
        number += 1
    if audio is not None:
        rate, channels = audio
        entries += _elem(
            TRACK_ENTRY,
            _elem(TRACK_NUMBER, _uint_payload(number))
            + _elem(TRACK_TYPE, _uint_payload(2))
            + _elem(CODEC_ID, b"A_PCM/INT/LIT")
            + _elem(
                AUDIO,
                _elem(SAMPLING_FREQUENCY, struct.pack(">d", float(rate)))
                + _elem(CHANNELS, _uint_payload(channels)),
            ),
        )
    segment = _elem(SEGMENT, info + _elem(TRACKS, entries))
    return header + segment
