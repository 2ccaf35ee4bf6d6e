"""Multimodal / binary-column plumbing (SURVEY.md §2.12 X6, §2.1 S4).

Design: image/audio/video travel as opaque BINARY columns plus typed
metadata (content_type, width/height from dms.extract). Decode and
feature-extraction run as Arrow-batched functions over ``mapInPandas``.
REAL end-to-end paths (pure stdlib, no external codec library):
  * PNG codec — zlib decode → unfilter (all 5 types) → resample →
    re-encode (decode_png/encode_png);
  * GIF codec — real LZW decode (variable code width, interlace, local
    palettes) + spec-valid LZW encoder (decode_gif/encode_gif),
    bit-exact BOTH directions against Java ImageIO;
  * TIFF codec — striped baseline decode, both byte orders, none/
    TIFF-LZW (early-change)/PackBits compressions (multimodal.tiff),
    cross-validated against Java ImageIO's TIFF writer;
  * WAV audio — RIFF/WAVE mux + demux + integer-exact PCM statistics
    (encode_wav/parse_wav/wav_features); decodes PCM-16, G.711
    µ-law/A-law (ITU expansion tables — bit-exact against Java
    AudioSystem's converter, both laws) and IMA/DVI + Microsoft ADPCM
    (4-bit adaptive, mono and stereo) to linear int16;
  * AVI video — RIFF/AVI mux + demux with avih timing and per-frame
    '00dc' payloads (encode_avi/parse_avi), wired into sample_frames;
  * JPEG — real APP1/Exif TIFF encode (encode_exif_jpeg), the IFD-walk
    parser in dms.extract, AND a full pixel codec (multimodal.jpeg):
    baseline/extended/progressive Huffman decode + baseline encode,
    cross-validated against Java ImageIO.
  * MP3 / MP4 — real MPEG audio frame-header walk and ISO BMFF
    sample-table demux (multimodal.containers), the hachoir-parity
    metadata surface plus bit-exact mp4 sample extraction.
Matroska/WebM demuxes for real too (multimodal.ebml: EBML varint walk
over Segment/Info/Tracks, plus — round 5 — the Cluster payload walk
with all four lacing modes, so PCM-audio/uncompressed-video mkv decodes
end-to-end).

THE LOSSY-CODEC BOUNDARY (the contract, stated once): every container
WALK and frame/sample EXTRACTION in this package is real — what remains
stubbed is exclusively lossy SAMPLE SYNTHESIS (MP3/AAC MDCT decode,
compressed-codec video frame decode), which needs ffmpeg-class codec
libraries this container doesn't ship by design. Operators that can hit
that boundary (``sample_frames``, ``resize_images``,
``with_binary_features``) emit a ``real`` boolean column: true = the
payload came off a real decode/demux path, false = the deterministic
fake stood in — downstream pipelines filter on it instead of guessing.

``ingest_binary_dir`` is the reference's blob-ingest path
(open().read() + create_file, src/DMS.py:106-121) as Spark's binaryFile
source — which surfaces exactly the WebHDFS FileStatus fields the
reference stored (path, modificationTime, length, content;
src/DMS.py:122,146-155).
"""

from __future__ import annotations

import functools
import hashlib
import math
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "path string, content_type string, length bigint, feature array<float>, "
    "real boolean"
)


def ingest_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw binary ingest: (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _tiff_ifd_bytes(entries: list[tuple[int, int, int, bytes]], base: int) -> bytes:
    """Serialize one TIFF IFD at absolute offset `base` (little-endian).
    Payloads over 4 bytes are appended after the entry table with their
    offsets patched in; entries must be pre-sorted by tag (TIFF rule)."""

    n = len(entries)
    head_len = 2 + 12 * n + 4
    head = struct.pack("<H", n)
    extra = b""
    for tag, typ, count, payload in entries:
        if len(payload) <= 4:
            val = payload.ljust(4, b"\x00")
        else:
            val = struct.pack("<I", base + head_len + len(extra))
            extra += payload
        head += struct.pack("<HHI", tag, typ, count) + val
    return head + struct.pack("<I", 0) + extra


def encode_exif_jpeg(
    width: int,
    height: int,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    iso: int | None = None,
) -> bytes:
    """Deterministic minimal JPEG with a real APP1/Exif TIFF block: SOI +
    APP1(IFD0: Make/Model/DateTime + Exif sub-IFD: DateTimeOriginal/ISO/
    pixel dims) + SOF0(height, width) + EOI. The encode-side counterpart
    of dms.extract's EXIF walk — exercised by the x6_exif_meta round-trip
    gate. `datetime` uses the EXIF convention 'YYYY:MM:DD HH:MM:SS'."""

    ascii_ = lambda s: s.encode("utf-8") + b"\x00"  # noqa: E731
    ifd0: list[tuple[int, int, int, bytes]] = []
    exif: list[tuple[int, int, int, bytes]] = []
    if make is not None:
        ifd0.append((0x010F, 2, len(make) + 1, ascii_(make)))
    if model is not None:
        ifd0.append((0x0110, 2, len(model) + 1, ascii_(model)))
    if datetime is not None:
        ifd0.append((0x0132, 2, len(datetime) + 1, ascii_(datetime)))
        exif.append((0x9003, 2, len(datetime) + 1, ascii_(datetime)))
    if iso is not None:
        exif.append((0x8827, 3, 1, struct.pack("<H", iso)))
    exif.append((0xA002, 4, 1, struct.pack("<I", width)))
    exif.append((0xA003, 4, 1, struct.pack("<I", height)))
    exif.sort()
    # The Exif-pointer payload is always 4 bytes inline, so IFD0's size is
    # independent of the pointer's value: size first, then patch.
    ifd0_with_ptr = sorted(ifd0 + [(0x8769, 4, 1, b"\x00\x00\x00\x00")])
    exif_off = 8 + len(_tiff_ifd_bytes(ifd0_with_ptr, 8))
    ifd0_with_ptr = sorted(ifd0 + [(0x8769, 4, 1, struct.pack("<I", exif_off))])
    tiff = (
        b"II*\x00"
        + struct.pack("<I", 8)
        + _tiff_ifd_bytes(ifd0_with_ptr, 8)
        + _tiff_ifd_bytes(exif, exif_off)
    )
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + 6 + len(tiff)) + b"Exif\x00\x00" + tiff
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app1 + sof0 + b"\xff\xd9"


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(data: bytes):
    i = 8
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        yield ctype, data[i + 8 : i + 8 + length]
        if ctype == b"IEND":
            break
        i += 12 + length  # length + type + payload + crc


def _valueerror_on_malformed(fn):
    """Byte parsers over untrusted input must surface ONE documented
    error type: wrap every low-level decode failure (cut slice, short
    struct, bad zlib stream, corrupt table) as ValueError so batch
    callers can catch-and-fall-back instead of crashing the Spark task
    (the round-3 decode_jpeg finding, applied to the whole codec
    family)."""

    @functools.wraps(fn)
    def wrapper(data, *args, **kwargs):
        try:
            return fn(data, *args, **kwargs)
        except (IndexError, struct.error, KeyError, TypeError, zlib.error,
                OverflowError, ZeroDivisionError) as exc:
            raise ValueError(
                f"malformed input to {fn.__name__}: {exc!r}"
            ) from exc

    return wrapper


@_valueerror_on_malformed
def decode_png(content: bytes) -> "np.ndarray":
    """Real PNG decode with stdlib zlib: chunk walk → IDAT inflate →
    per-scanline unfilter (all five filter types) → HxWx3 uint8 array.
    Supports 8-bit gray/RGB/RGBA, non-interlaced (gray replicates to 3
    channels, alpha is dropped); anything else raises NotImplementedError
    so callers can fall back."""

    data = bytes(content)
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    width = height = channels = None
    idat: list[bytes] = []
    for ctype, chunk in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, bitd, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
            if bitd != 8 or interlace != 0 or color not in (0, 2, 6):
                raise NotImplementedError(
                    f"PNG bitdepth={bitd} color={color} interlace={interlace}"
                )
            channels = {0: 1, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            idat.append(chunk)
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 2:  # Up (uint8 arithmetic wraps mod 256 as specified)
            line += prev
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x - channels]
            for c in range(channels):
                np.add.accumulate(line[c::channels], out=line[c::channels])
        elif ftype == 3:  # Average — sequential by definition
            for x in range(stride):
                left = int(line[x - channels]) if x >= channels else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) % 256
        elif ftype == 4:  # Paeth — sequential by definition
            for x in range(stride):
                a = int(line[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) % 256
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = line
        prev = line
    arr = out.reshape(height, width, channels)
    if channels == 1:
        return np.repeat(arr, 3, axis=2)
    return arr[:, :, :3]


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:

    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: "np.ndarray") -> bytes:
    """Real PNG encode: HxWx3 uint8 → 8-bit truecolor, filter 0 scanlines,
    one zlib-deflated IDAT. Deterministic for a given input (fixed
    compression level), valid per the PNG spec (CRC'd chunks)."""

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects an HxWx3 uint8 array")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def resize_nearest(arr: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Deterministic nearest-neighbor resample (pure numpy indexing)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def resize_bilinear(arr: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Deterministic FIXED-POINT bilinear resample (16.16 arithmetic,
    half-pixel centers, edge clamp): the quality upgrade over
    resize_nearest for thumbnails, with integer-exact rounding so the
    same input yields the same bytes on any worker or numpy version.
    Kept OPT-IN — resize_nearest stays the default so the pinned
    thumbnail digests never move."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    SH = 16
    ONE = 1 << SH

    def axis_coords(n_out: int, n_in: int):
        # source center = (i + 0.5) * n_in / n_out - 0.5, in 16.16
        pos = ((2 * np.arange(n_out, dtype=np.int64) + 1) * n_in * ONE) // (
            2 * n_out
        ) - ONE // 2
        pos = np.clip(pos, 0, (n_in - 1) * ONE)
        i0 = pos >> SH
        frac = pos - (i0 << SH)
        i1 = np.minimum(i0 + 1, n_in - 1)
        return i0, i1, frac

    y0, y1, fy = axis_coords(height, h)
    x0, x1, fx = axis_coords(width, w)
    p = a.astype(np.int64)
    top = p[y0][:, x0] * (ONE - fx)[None, :, None] + p[y0][:, x1] * fx[None, :, None]
    bot = p[y1][:, x0] * (ONE - fx)[None, :, None] + p[y1][:, x1] * fx[None, :, None]
    out = top * (ONE - fy)[:, None, None] + bot * fy[:, None, None]
    # round-half-up after the two 16.16 multiplies (32-bit shift back)
    return ((out + (1 << (2 * SH - 1))) >> (2 * SH)).astype(np.uint8)


def decode_image(content: bytes) -> "np.ndarray":
    """Decode an image payload to an HxWx3 array.

    PNG decodes for real (stdlib zlib — see decode_png); JPEG decodes for
    real too (multimodal.jpeg — baseline, extended sequential AND
    progressive DCT, validated bit-for-bit-close against Java ImageIO,
    including the reference's own demo fixture demo/example_picture.jpg,
    demo/demo.py:14); GIF decodes for real as well (LZW + interlace,
    decode_gif, bit-exact both directions against Java ImageIO); lossless
    WebP (VP8L) decodes for real too (multimodal/webp.py, bit-exact
    round-trip with its own encoder — VP8L is lossless). Remaining
    formats (lossy-VP8 webp, heic…) raise so callers can fall back;
    production swaps this dispatch for a full decoder."""
    data = bytes(content[:8])
    if data == _PNG_MAGIC:
        return decode_png(content)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(content)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        from dmshadoop_spark.multimodal.tiff import decode_tiff

        return decode_tiff(content)
    if data[:2] == b"\xff\xd8":
        from dmshadoop_spark.multimodal.jpeg import decode_jpeg

        return decode_jpeg(content)
    if data[:4] == b"RIFF" and bytes(content[8:12]) == b"WEBP":
        from dmshadoop_spark.multimodal.webp import decode_webp_rgb

        # lossless VP8L decodes for real; lossy VP8 raises
        # NotImplementedError inside and falls through to the caller's
        # flagged fallback, same contract as heic below
        return decode_webp_rgb(content)
    raise NotImplementedError(
        "only PNG/JPEG/GIF/TIFF/lossless-WebP decode ships in-container "
        "(lossy-webp/heic need external codecs)"
    )


def fake_image_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in featurizer: sha256 → unit-norm pseudo-vector.
    The FALLBACK for payloads ``decode_image`` cannot decode (webp/heic,
    non-image bytes) — decodable formats go through ``image_features``."""
    digest = hashlib.sha256(content).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    vec = (raw.astype("float64") / 2**32) - 0.5
    norm = float(np.sqrt((vec * vec).sum())) or 1.0
    return [float(x) for x in (vec / norm)]


def image_stats(arr: "np.ndarray") -> dict:
    """Integer-exact pixel statistics from an HxWx3 uint8 array — every
    sum/count runs in int64 (exact), and each float output is ONE IEEE
    division or sqrt from exact integers, so any engine recomputing from
    the same pixels reproduces the values bit-for-bit (the wav_features
    determinism contract, applied to images). Returns:
      channel_mean[3], channel_std[3]   — per-channel mean and population
        std (std = sqrt(n·Σv² − (Σv)²)/n: one sqrt over an exact int,
        one division);
      grad_x, grad_y — mean |Δ| of the channel-sum plane s = r+g+b along
        x / y (edge-energy signals; exact integer numerators);
      hist[8] — pixel counts of s in 8 equal bins of width 96 (bin 7
        clamps the 672..765 tail), as exact ints.
    """
    a = arr.astype(np.int64)
    h, w = a.shape[:2]
    n = h * w
    flat = a.reshape(-1, 3)
    sums = flat.sum(axis=0)
    sumsq = (flat * flat).sum(axis=0)
    mean = sums / n
    std = np.sqrt((n * sumsq - sums * sums).astype(np.float64)) / n
    s = a.sum(axis=2)  # channel-sum plane, 0..765
    gx = int(np.abs(np.diff(s, axis=1)).sum())
    gy = int(np.abs(np.diff(s, axis=0)).sum())
    hist = np.bincount(
        np.minimum(s // 96, 7).reshape(-1), minlength=8
    )
    return {
        "width": w,
        "height": h,
        "channel_mean": [float(x) for x in mean],
        "channel_std": [float(x) for x in std],
        "grad_x": gx / (h * (w - 1)) if w > 1 else 0.0,
        "grad_y": gy / ((h - 1) * w) if h > 1 else 0.0,
        "hist": [int(x) for x in hist],
    }


def image_features(content: bytes) -> tuple[list[float], bool]:
    """REAL pixel-statistics featurizer: decode (PNG/JPEG/GIF/TIFF and
    lossless WebP — the real decoders behind ``decode_image``) → the
    FEATURE_DIM=16
    vector [mean_rgb×3, std_rgb×3, grad_x, grad_y, hist_frac×8] from
    ``image_stats``. Undecodable payloads fall back to the deterministic
    sha256 pseudo-vector. Returns (vector, real) where ``real`` says
    which path produced it — downstream filters on the flag."""
    try:
        arr = decode_image(bytes(content))
    except (ValueError, NotImplementedError):
        return fake_image_features(content), False
    st = image_stats(arr)
    n = st["width"] * st["height"]
    vec = (
        st["channel_mean"]
        + st["channel_std"]
        + [st["grad_x"], st["grad_y"]]
        + [c / n for c in st["hist"]]
    )
    return [float(x) for x in vec], True


def _sniff_type(content: bytes) -> str:
    from dmshadoop_spark.dms.extract import _sniff

    return _sniff(content)


def with_binary_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction over a binaryFile-shaped input
    (columns: path, content). Arrow batches flow in/out; per-batch Python
    cost is amortized. PNG/JPEG/GIF/TIFF payloads get REAL pixel-statistic
    features (``image_features`` over the in-repo decoders, real=true);
    undecodable payloads get the deterministic sha256 pseudo-vector
    (real=false) so the pipeline never drops rows."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            pairs = [image_features(bytes(c)) for c in content]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "content_type": content.map(lambda c: _sniff_type(bytes(c))),
                    "length": content.map(len).astype("int64"),
                    "feature": [p[0] for p in pairs],
                    "real": pd.Series(
                        [p[1] for p in pairs], dtype="bool"
                    ),
                }
            )

    return binary_df.select("path", "content").mapInPandas(
        extract, schema=FEATURES_SCHEMA
    )


# --------------------------------------------------------------------------
# REAL audio codec: RIFF/WAVE PCM encode + parse (pure stdlib struct).
# The reference's hachoir pulled duration/sample-rate metadata from media
# files (src/DMS.py:70-91); this is the Spark-era equivalent with the
# container parsed for real — only lossy codecs (mp3/aac) would need an
# external library.
# --------------------------------------------------------------------------


def encode_wav(samples: "np.ndarray", sample_rate: int, channels: int = 1) -> bytes:
    """Spec-valid RIFF/WAVE: PCM 16-bit little-endian, one fmt + one data
    chunk. ``samples`` is int16, frame-interleaved when channels > 1."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(data: bytes, start: int, end: int):
    """Walk RIFF sub-chunks in data[start:end): yields (fourcc, lo, hi)
    payload bounds. Chunks pad to even offsets per the RIFF spec."""
    i = start
    while i + 8 <= end:
        fourcc = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        lo = i + 8
        yield fourcc, lo, min(lo + size, end)
        i = lo + size + (size % 2)


def _g711_tables() -> tuple["np.ndarray", "np.ndarray"]:
    """256-entry µ-law / A-law decode tables from the ITU-T G.711
    expansion formulas (the CCITT reference arithmetic found in every
    codec text): int16 linear value per 8-bit code."""
    codes = np.arange(256, dtype=np.int32)
    # µ-law: complement, split sign/segment/mantissa, biased expand
    u = (~codes) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    ulaw = np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)
    # A-law: XOR 0x55, segment 0 is linear, sign bit SET means positive
    a = codes ^ 0x55
    seg = (a & 0x70) >> 4
    q = a & 0x0F
    t = np.where(seg == 0, (q << 1) + 1 << 3, ((q << 1) + 1 + 32) << (seg + 2))
    alaw = np.where(a & 0x80, t, -t).astype(np.int16)
    return ulaw, alaw


_ULAW_TABLE, _ALAW_TABLE = _g711_tables()
_WAV_FMT_PCM, _WAV_FMT_ALAW, _WAV_FMT_ULAW = 1, 6, 7
_WAV_FMT_IMA_ADPCM = 0x11

# IMA/DVI ADPCM reference tables (IMA "Recommended Practices for
# Enhancing Digital Audio Compatibility", public spec)
_IMA_INDEX_ADJUST = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int32,
)


def _ima_decode_nibbles(nibbles, predictor: int, index: int):
    """Decode a 4-bit IMA ADPCM nibble stream given the block's initial
    predictor/index (the IMA reference expansion, integer-exact)."""
    out = np.empty(len(nibbles), dtype=np.int16)
    for i, n in enumerate(nibbles):
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        predictor = predictor - diff if n & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + int(_IMA_INDEX_ADJUST[n])))
        out[i] = predictor
    return out, predictor, index


def _ima_encode_sample(sample: int, predictor: int, index: int):
    """Quantize one sample against the current predictor/index (the IMA
    reference compressor); returns (nibble, new_predictor, new_index)."""
    step = int(_IMA_STEPS[index])
    diff = sample - predictor
    nibble = 8 if diff < 0 else 0
    if diff < 0:
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    step >>= 1
    if diff >= step:
        nibble |= 2
        diff -= step
    step >>= 1
    if diff >= step:
        nibble |= 1
    # reconstruct exactly as the decoder will
    step = int(_IMA_STEPS[index])
    acc = step >> 3
    if nibble & 1:
        acc += step >> 2
    if nibble & 2:
        acc += step >> 1
    if nibble & 4:
        acc += step
    predictor = predictor - acc if nibble & 8 else predictor + acc
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + int(_IMA_INDEX_ADJUST[nibble])))
    return nibble, predictor, index


# MS-ADPCM reference tables (Microsoft WAVE spec / multimedia standards
# update; the 7 standard predictor coefficient pairs)
_MS_ADPCM_COEFFS = (
    (256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208),
    (392, -232),
)
_MS_ADPCM_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230,
    230, 230,
)
_WAV_FMT_MS_ADPCM = 2


def _ms_adpcm_step(nib: int, s1: int, s2: int, c1: int, c2: int, delta: int):
    """One MS-ADPCM expansion step with C-truncating prediction division
    (the spec decoders' semantics, not Python floor)."""
    signed = nib - 16 if nib >= 8 else nib
    acc = s1 * c1 + s2 * c2
    pred = (abs(acc) // 256) * (1 if acc >= 0 else -1) + signed * delta
    pred = max(-32768, min(32767, pred))
    return pred, max(16, (_MS_ADPCM_ADAPT[nib] * delta) // 256)


def _ms_adpcm_decode_block(
    block: bytes, n_samples: int, channels: int = 1
) -> "np.ndarray":
    """Decode one MS-ADPCM block. Mono: 7-byte preamble + 4-bit codes.
    Stereo: interleaved preamble (bpred L,R; idelta L,R; samp1 L,R;
    samp2 L,R = 14 bytes), then each byte carries LEFT in the high
    nibble, RIGHT in the low; output is frame-interleaved.
    ``n_samples`` is per channel."""
    pre = 7 * channels
    if len(block) < pre:
        raise ValueError("MS-ADPCM block too short")
    preds = list(block[:channels])
    if any(p >= len(_MS_ADPCM_COEFFS) for p in preds):
        raise ValueError(f"MS-ADPCM predictor {preds} out of range")
    coeffs = [_MS_ADPCM_COEFFS[p] for p in preds]
    rest = struct.unpack("<" + "h" * (3 * channels), block[channels:pre])
    delta = list(rest[0:channels])
    s1 = list(rest[channels : 2 * channels])
    s2 = list(rest[2 * channels : 3 * channels])
    out = np.empty(n_samples * channels, dtype=np.int16)
    for c in range(channels):
        out[c] = s2[c]
        if n_samples > 1:
            out[channels + c] = s1[c]
    pos = 2 * channels
    end = n_samples * channels
    for byte in block[pre:]:
        for k, nib in enumerate((byte >> 4, byte & 0x0F)):
            if pos >= end:
                break
            c = (k if channels == 2 else 0)
            pred, delta[c] = _ms_adpcm_step(
                nib, s1[c], s2[c], coeffs[c][0], coeffs[c][1], delta[c]
            )
            s2[c], s1[c] = s1[c], pred
            out[pos] = pred
            pos += 1
    return out[:pos] if pos < end else out


def _ms_adpcm_quantize(sample: int, s1: int, s2: int, c1: int, c2: int,
                       delta: int):
    """Greedy one-step quantizer mirroring the decoder's reconstruction."""
    acc = s1 * c1 + s2 * c2
    pred = (abs(acc) // 256) * (1 if acc >= 0 else -1)
    err = sample - pred
    nib = max(-8, min(7, int(round(err / delta)) if delta else 0))
    code = nib + 16 if nib < 0 else nib
    rec = max(-32768, min(32767, pred + nib * delta))
    return code, rec, max(16, (_MS_ADPCM_ADAPT[code] * delta) // 256)


def encode_wav_ms_adpcm(
    samples: "np.ndarray", sample_rate: int, block_samples: int = 500,
    predictor: int = 0, channels: int = 1,
) -> bytes:
    """Spec-valid MS-ADPCM WAV (format 2), mono or stereo: per block, a
    7-byte-per-channel preamble (predictor index, initial delta, two
    seed samples — stereo fields interleaved L,R) then 4-bit codes
    quantized greedily against the adaptive delta (stereo: LEFT in the
    high nibble, RIGHT in the low). Deterministic; stereo ``samples``
    are frame-interleaved int16."""
    if channels not in (1, 2):
        raise ValueError("encode_wav_ms_adpcm supports 1 or 2 channels")
    s = np.ascontiguousarray(samples, dtype=np.int16).astype(np.int32)
    c1, c2 = _MS_ADPCM_COEFFS[predictor]
    n_codes = (block_samples - 2) * channels
    block_align = 7 * channels + (n_codes + 1) // 2
    frames = len(s) // channels
    blocks = []
    for lo in range(0, frames, block_samples):
        chunk = s[lo * channels : (lo + block_samples) * channels]
        chans = [chunk[c::channels] for c in range(channels)]
        s1 = [0] * channels
        s2 = [0] * channels
        delta = [128] * channels
        for c in range(channels):
            seeds = list(chans[c][:2]) + [0, 0]
            s2[c], s1[c] = int(seeds[0]), int(seeds[1])
        header = (
            bytes([predictor] * channels)
            + b"".join(struct.pack("<h", delta[c]) for c in range(channels))
            + b"".join(struct.pack("<h", s1[c]) for c in range(channels))
            + b"".join(struct.pack("<h", s2[c]) for c in range(channels))
        )
        codes = []
        n_steps = max(0, max(len(ch) for ch in chans) - 2)
        for i in range(n_steps):
            for c in range(channels):
                sample = int(chans[c][2 + i]) if 2 + i < len(chans[c]) else 0
                code, rec, delta[c] = _ms_adpcm_quantize(
                    sample, s1[c], s2[c], c1, c2, delta[c]
                )
                s2[c], s1[c] = s1[c], rec
                codes.append(code)
        codes += [0] * (n_codes - len(codes))
        packed = bytes(
            ((codes[i] & 0x0F) << 4) | (codes[i + 1] & 0x0F)
            for i in range(0, len(codes), 2)
        )
        blocks.append(header + packed)
    payload = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHHH", _WAV_FMT_MS_ADPCM, channels, sample_rate,
        sample_rate * block_align // block_samples, block_align, 4,
        4, block_samples, len(_MS_ADPCM_COEFFS),
    ) + b"".join(struct.pack("<hh", a, b) for a, b in _MS_ADPCM_COEFFS)
    fact = struct.pack("<I", frames)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima_adpcm(
    samples: "np.ndarray", sample_rate: int, block_samples: int = 505,
    channels: int = 1,
) -> bytes:
    """Spec-valid IMA ADPCM WAV (format 0x11), mono or stereo:
    block-structured 4:1 compression — each block opens with one
    (predictor int16, index uint8, 0) header PER CHANNEL, then nibble
    data in 4-byte words alternating channels (L first), two nibbles per
    byte low-first. ``block_samples`` is the per-block sample count per
    channel (505 → the common 256-byte mono block); stereo ``samples``
    are frame-interleaved int16."""
    if channels not in (1, 2):
        raise ValueError("encode_wav_ima_adpcm supports 1 or 2 channels")
    s = np.ascontiguousarray(samples, dtype=np.int16)
    n_nib = block_samples - 1
    # per channel: nibbles round up to whole 4-byte words in stereo
    words_per_chan = (n_nib + 7) // 8 if channels == 2 else 0
    if channels == 1:
        block_align = 4 + (n_nib + 1) // 2
    else:
        block_align = 8 + words_per_chan * 8
    frames = len(s) // channels
    blocks = []
    index = [0] * channels
    for lo in range(0, frames, block_samples):
        chunk = s[lo * channels : (lo + block_samples) * channels]
        chans = [chunk[c::channels] for c in range(channels)]
        headers = b""
        chan_nibs = []
        for c in range(channels):
            predictor = int(chans[c][0]) if len(chans[c]) else 0
            headers += struct.pack("<hBB", predictor, index[c], 0)
            nibs = []
            for sample in chans[c][1:]:
                nib, predictor, index[c] = _ima_encode_sample(
                    int(sample), predictor, index[c]
                )
                nibs.append(nib)
            pad_to = n_nib if channels == 1 else words_per_chan * 8
            nibs += [0] * (pad_to - len(nibs))
            chan_nibs.append(nibs)
        if channels == 1:
            nibs = chan_nibs[0]
            packed = bytes(
                (nibs[i] & 0x0F) | ((nibs[i + 1] & 0x0F) << 4)
                for i in range(0, len(nibs), 2)
            )
        else:
            packed = b""
            for w in range(words_per_chan):
                for c in range(channels):
                    nib8 = chan_nibs[c][w * 8 : w * 8 + 8]
                    packed += bytes(
                        (nib8[i] & 0x0F) | ((nib8[i + 1] & 0x0F) << 4)
                        for i in range(0, 8, 2)
                    )
        blocks.append(headers + packed)
    payload = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH", _WAV_FMT_IMA_ADPCM, channels, sample_rate,
        sample_rate * block_align // block_samples, block_align, 4,
        2, block_samples,
    )
    fact = struct.pack("<I", frames)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_g711(
    samples: "np.ndarray", sample_rate: int, law: str = "ulaw",
    channels: int = 1,
) -> bytes:
    """Spec-valid RIFF/WAVE with G.711 compression (format 7 = µ-law,
    6 = A-law): each int16 sample maps to the 8-bit code whose decode is
    NEAREST (ties to the lower code) — exact inverse on decode-table
    values, free of the reference encoders' segment-boundary edge cases,
    and bit-deterministic."""
    table = {"ulaw": _ULAW_TABLE, "alaw": _ALAW_TABLE}[law]
    fmt_code = _WAV_FMT_ULAW if law == "ulaw" else _WAV_FMT_ALAW
    order = np.argsort(table, kind="stable")
    sorted_vals = table[order].astype(np.int32)
    s = np.ascontiguousarray(samples, dtype=np.int16).astype(np.int32)
    pos = np.searchsorted(sorted_vals, s)
    pos = np.clip(pos, 1, len(sorted_vals) - 1)
    left, right = sorted_vals[pos - 1], sorted_vals[pos]
    pick = np.where(np.abs(s - left) <= np.abs(right - s), pos - 1, pos)
    payload = order[pick].astype(np.uint8).tobytes()
    block_align = channels
    fmt = struct.pack(
        "<HHIIHH", fmt_code, channels, sample_rate,
        sample_rate * block_align, block_align, 8,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_valueerror_on_malformed
def parse_wav(data: bytes) -> dict:
    """Real WAV parse: verify RIFF/WAVE, walk chunks for fmt + data, return
    {sample_rate, channels, bits, samples(np.int16)}. Decodes PCM-16
    directly, G.711 µ-law/A-law (formats 7/6, 8-bit telephony audio)
    through the ITU expansion tables, and mono IMA/DVI ADPCM (format
    0x11, block-structured 4-bit) through the IMA reference expansion —
    ``samples`` is always linear int16. Raises ValueError on a malformed
    container, NotImplementedError on other encodings (float, extensible)."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = fmt_raw = pcm = fact_samples = None
    for fourcc, lo, hi in _riff_chunks(data, 12, len(data)):
        if fourcc == b"fmt ":
            fmt = struct.unpack("<HHIIHH", data[lo : lo + 16])
            fmt_raw = data[lo:hi]
        elif fourcc == b"data":
            pcm = data[lo:hi]
        elif fourcc == b"fact" and hi - lo >= 4:
            (fact_samples,) = struct.unpack("<I", data[lo : lo + 4])
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _brate, balign, bits = fmt
    if audio_format == _WAV_FMT_PCM and bits == 16:
        samples = np.frombuffer(pcm, dtype="<i2")
    elif audio_format in (_WAV_FMT_ULAW, _WAV_FMT_ALAW) and bits == 8:
        table = _ULAW_TABLE if audio_format == _WAV_FMT_ULAW else _ALAW_TABLE
        samples = table[np.frombuffer(pcm, dtype=np.uint8)]
    elif audio_format == _WAV_FMT_MS_ADPCM and bits == 4 and channels in (1, 2):
        if len(fmt_raw) < 20 or balign < 7 * channels + 1:
            raise ValueError("MS-ADPCM fmt missing samplesPerBlock")
        (spb,) = struct.unpack("<H", fmt_raw[18:20])
        decoded = []
        for blo in range(0, len(pcm), balign):
            block = pcm[blo : blo + balign]
            if len(block) < 7 * channels:
                break
            decoded.append(_ms_adpcm_decode_block(block, spb, channels))
        samples = (
            np.concatenate(decoded) if decoded else np.empty(0, np.int16)
        )
        if fact_samples is not None:
            samples = samples[: fact_samples * channels]
    elif audio_format == _WAV_FMT_IMA_ADPCM and bits == 4 and channels in (1, 2):
        if len(fmt_raw) < 20 or balign < 4 * channels + 1:
            raise ValueError("IMA ADPCM fmt missing samplesPerBlock")
        (spb,) = struct.unpack("<H", fmt_raw[18:20])
        decoded = []
        for blo in range(0, len(pcm), balign):
            block = pcm[blo : blo + balign]
            if len(block) < 4 * channels:
                break
            chans = []
            for c in range(channels):
                predictor, index, _ = struct.unpack(
                    "<hBB", block[4 * c : 4 * c + 4]
                )
                index = max(0, min(88, index))
                # data region: 4-byte words alternating channels, L first
                words = [
                    block[j : j + 4]
                    for j in range(4 * channels + 4 * c, len(block), 4 * channels)
                ]
                packed = np.frombuffer(b"".join(words), dtype=np.uint8)
                nibbles = np.empty(len(packed) * 2, dtype=np.uint8)
                nibbles[0::2] = packed & 0x0F
                nibbles[1::2] = packed >> 4
                expanded, _, _ = _ima_decode_nibbles(
                    nibbles[: spb - 1], int(predictor), int(index)
                )
                chans.append(
                    np.concatenate(([np.int16(predictor)], expanded))
                )
            n_frames_blk = min(len(c) for c in chans)
            inter = np.empty(n_frames_blk * channels, dtype=np.int16)
            for c in range(channels):
                inter[c::channels] = chans[c][:n_frames_blk]
            decoded.append(inter)
        samples = (
            np.concatenate(decoded) if decoded else np.empty(0, np.int16)
        )
        if fact_samples is not None:  # trim final-block zero padding
            samples = samples[: fact_samples * channels]
    else:
        raise NotImplementedError(f"WAV format={audio_format} bits={bits}")
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "samples": samples,
    }


def wav_features(data: bytes) -> dict:
    """Parse a WAV payload and compute integer-exact PCM statistics:
    n_samples (per channel), duration, peak = max|s|, rms = sqrt(Σs²/n).
    Sums run in Python int (exact); the only float ops are the final
    divisions and sqrt — one correctly-rounded IEEE op each, reproducible
    in any engine."""
    w = parse_wav(data)
    s = w["samples"].astype(np.int64)
    n = len(s) // w["channels"]
    sum_sq = int((s * s).sum())
    return {
        "sample_rate": w["sample_rate"],
        "channels": w["channels"],
        "bits": w["bits"],
        "n_samples": n,
        "duration": n / w["sample_rate"],
        "peak": int(np.abs(s).max()) if len(s) else 0,
        "rms": math.sqrt(sum_sq / len(s)) if len(s) else 0.0,
    }


def audio_features(data: bytes, frame: int = 256) -> dict:
    """Audio-quality signals over any decodable WAV (PCM/G.711/ADPCM —
    parse_wav normalizes all of them to linear int16): the features an
    audio-corpus filter gates on, split by determinism class.

    Integer-EXACT (engine/worker-portable, safe for value oracles):
      zero_crossings — sign changes over the stream (noise vs tone);
      n_frames, max_frame_energy, n_silent_frames — Σs² per ``frame``
      samples in Python int (silence = zero energy frame).
    Float (deterministic per platform, digest-pin rather than oracle):
      spectral_centroid_hz, spectral_bandwidth_hz — magnitude-weighted
      mean/stddev frequency of the one-sided rFFT.
    """
    w = parse_wav(data)
    s = w["samples"].astype(np.int64)
    n = len(s)
    if n == 0:
        return {
            "sample_rate": w["sample_rate"], "n_samples": 0,
            "zero_crossings": 0, "n_frames": 0, "max_frame_energy": 0,
            "n_silent_frames": 0, "spectral_centroid_hz": 0.0,
            "spectral_bandwidth_hz": 0.0,
        }
    signs = np.sign(s)
    nz = signs != 0
    zc = int((np.diff(signs[nz]) != 0).sum())
    n_frames = (n + frame - 1) // frame
    energies = [
        int((s[lo : lo + frame] ** 2).sum()) for lo in range(0, n, frame)
    ]
    spec = np.abs(np.fft.rfft(s.astype(np.float64)))
    freqs = np.fft.rfftfreq(n, d=1.0 / w["sample_rate"])
    total = float(spec.sum())
    if total > 0.0:
        centroid = float((spec * freqs).sum() / total)
        bandwidth = float(
            np.sqrt((spec * (freqs - centroid) ** 2).sum() / total)
        )
    else:
        centroid = bandwidth = 0.0
    return {
        "sample_rate": w["sample_rate"],
        "n_samples": n,
        "zero_crossings": zc,
        "n_frames": n_frames,
        "max_frame_energy": max(energies),
        "n_silent_frames": sum(1 for e in energies if e == 0),
        "spectral_centroid_hz": centroid,
        "spectral_bandwidth_hz": bandwidth,
    }


# --------------------------------------------------------------------------
# REAL video container: minimal RIFF/AVI mux + demux (pure stdlib).
# Frames are opaque per-frame payloads ('00dc' chunks) — pair with the
# real PNG codec above for a fully real synth→mux→demux→decode video path.
# --------------------------------------------------------------------------


def encode_avi(frames: list[bytes], fps: int, width: int = 0, height: int = 0) -> bytes:
    """Spec-shaped RIFF/AVI: LIST hdrl (avih main header with
    microsec-per-frame and total-frame count) + LIST movi with one '00dc'
    chunk per frame (even-padded). Enough structure that any RIFF walker
    can demux it; deterministic byte-for-byte."""
    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0, len(frames), 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" + (
        b"avih" + struct.pack("<I", len(avih)) + avih
    )
    movi_body = b"".join(
        b"00dc" + struct.pack("<I", len(f)) + f + (b"\x00" if len(f) % 2 else b"")
        for f in frames
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_valueerror_on_malformed
def parse_avi(data: bytes) -> tuple[int, list[bytes]]:
    """Real AVI demux: verify RIFF/'AVI ', find avih inside LIST hdrl
    (microseconds per frame), collect '00dc'/'00db' frame payloads inside
    LIST movi. Returns (us_per_frame, frames)."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    us_per_frame = 0
    frames: list[bytes] = []
    for fourcc, lo, hi in _riff_chunks(data, 12, len(data)):
        if fourcc != b"LIST":
            continue
        subtype = data[lo : lo + 4]
        if subtype == b"hdrl":
            for cc, clo, chi in _riff_chunks(data, lo + 4, hi):
                if cc == b"avih":
                    (us_per_frame,) = struct.unpack("<I", data[clo : clo + 4])
        elif subtype == b"movi":
            for cc, clo, chi in _riff_chunks(data, lo + 4, hi):
                if cc in (b"00dc", b"00db"):
                    frames.append(data[clo:chi])
    return us_per_frame, frames


THUMBNAIL_SCHEMA = (
    "path string, width int, height int, thumbnail binary, real boolean"
)

FRAMES_SCHEMA = (
    "path string, frame_idx int, ts_sec double, frame binary, real boolean"
)


def _sample_stride(n: int, span: float, every_s: float) -> int:
    """Frame stride for ~one emitted frame per ``every_s`` over ``n``
    frames whose timestamps span ``span`` seconds (span = the LAST
    frame's start time, so the estimate skews ~n/(n−1) dense); shared
    by the mp3/mkv/mp4 branches of ``sample_frames`` so the policy
    can't drift between containers."""
    return max(1, round(n * every_s / span)) if span > 0 else 1


def fake_thumbnail(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→encode: a pseudo-pixel
    buffer of exactly width*height*3 bytes streamed from sha256(content).
    Replaces `decode_image` + real resampling in production."""
    need = width * height * 3
    digest = hashlib.sha256(content).digest()
    return (digest * (need // len(digest) + 1))[:need]


def resize_images(
    binary_df: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """mapInPandas resize over a binaryFile-shaped input → one thumbnail
    row per image. Arrow batches in/out. All four decodable formats go
    through the REAL codec path: PNG and JPEG re-encode in their own
    format (decode → nearest resample → re-encode), GIF and TIFF decode
    for real and emit PNG thumbnails (the normalized thumbnail format —
    GIF would force palette re-quantization, TIFF is the archival
    source, not a thumbnail target). Undecodable payloads fall back to
    the deterministic fake, flagged real=false so downstream filters can
    drop them. Schema, batching, and partitioning are identical on both
    paths."""

    def one(c: bytes) -> tuple[bytes, bool]:
        raw = bytes(c)
        if raw[:8] == _PNG_MAGIC:
            try:
                return (
                    encode_png(resize_nearest(decode_png(raw), width, height)),
                    True,
                )
            except (NotImplementedError, ValueError):
                pass  # exotic PNG variant → fake path
        elif raw[:2] == b"\xff\xd8":
            from dmshadoop_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

            try:
                # real JPEG path: decode (incl. progressive) → resample →
                # re-encode baseline; thumbnails stay JPEG
                return (
                    encode_jpeg(resize_nearest(decode_jpeg(raw), width, height)),
                    True,
                )
            except (NotImplementedError, ValueError):
                pass  # metadata-only/exotic JPEG → fake path
        elif raw[:6] in (b"GIF87a", b"GIF89a") or raw[:4] in (
            b"II*\x00",
            b"MM\x00*",
        ):
            try:
                # GIF/TIFF decode for real; thumbnails normalize to PNG
                return (
                    encode_png(
                        resize_nearest(decode_image(raw), width, height)
                    ),
                    True,
                )
            except (NotImplementedError, ValueError):
                pass  # exotic compression/layout → fake path
        return fake_thumbnail(raw, width, height), False

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [one(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "thumbnail": [p[0] for p in pairs],
                    "real": pd.Series([p[1] for p in pairs], dtype="bool"),
                }
            )

    return binary_df.select("path", "content").mapInPandas(
        work, schema=THUMBNAIL_SCHEMA
    )


_MPEG_SYNC_WINDOW = 8192


def _mpeg_sync_near_start(raw: bytes) -> bool:
    """True iff two consecutive valid MPEG audio frames start anywhere in
    the first ``_MPEG_SYNC_WINDOW`` bytes (after an ID3v2 skip). The
    sniffer (_sniff) only accepts a frame at offset 0, but real rips
    routinely carry leading junk that ``mp3_frames`` would skip; this
    bounded pre-check lets ``sample_frames`` route such streams to the
    real walk without paying an O(n) scan on every non-audio payload."""
    from dmshadoop_spark.multimodal.containers import _mp3_frame_at

    start = 0
    if raw[:3] == b"ID3" and len(raw) >= 10:
        start = 10 + (
            (raw[6] & 0x7F) << 21 | (raw[7] & 0x7F) << 14
            | (raw[8] & 0x7F) << 7 | (raw[9] & 0x7F)
        )
    end = min(len(raw) - 4, start + _MPEG_SYNC_WINDOW)
    for i in range(start, end):
        parsed = _mp3_frame_at(raw, i)
        if parsed and _mp3_frame_at(raw, i + parsed[0]):
            return True
    return False


def sample_frames(
    binary_df: DataFrame, every_s: float = 1.0, bytes_per_s: int = 1000
) -> DataFrame:
    """mapInPandas frame sampling over video payloads: one output row per
    sampled frame — the UDTF-shaped (1 row → N rows) multimodal pattern.

    RIFF/AVI payloads demux for REAL (parse_avi: avih timing + '00dc'
    frame chunks), ISO BMFF (mp4) payloads demux for real too
    (containers.parse_mp4: full stts/stsc/stsz/stco sample-table walk),
    Matroska payloads since round 5 (ebml.mkv_blocks: Cluster →
    SimpleBlock/BlockGroup walk, all four lacing modes), MPEG audio
    since round 6 (containers.mp3_frames: the frame-header walk), and
    animated WebP since round 7 (webp.webp_anim_frames: ANMF chunk walk
    with cumulative durations as timestamps; every frame is a lossless
    VP8L still that decode_image decodes exactly): each
    emits every stride-th ACTUAL frame payload with its container-derived
    timestamp, flagged real=true. Any other container falls back to the
    deterministic stub (real=false): duration := length / bytes_per_s,
    frames at every_s intervals, each frame a sha256(content || idx)
    pseudo-payload. Partitioning, batch fan-out, and the (path,
    frame_idx, ts_sec, frame, real) contract are identical on both
    paths."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_path, out_idx, out_ts, out_frame = [], [], [], []
            out_real: list[bool] = []

            def emit(path, idx, ts, frame, real):
                out_path.append(path)
                out_idx.append(idx)
                out_ts.append(ts)
                out_frame.append(frame)
                out_real.append(real)

            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                    uspf, all_frames = parse_avi(raw)
                    stride = max(1, int(every_s * 1_000_000 / uspf)) if uspf else 1
                    for i in range(0, len(all_frames), stride):
                        emit(path, i, i * uspf / 1_000_000, all_frames[i], True)
                    continue
                # Dispatch through the real sniffer, not a bare 2-byte
                # sync check: FF Ex occurs in non-audio payloads (the
                # UTF-16-LE BOM is FF FE), and _sniff already demands a
                # second consecutive valid frame before claiming
                # audio/mpeg (round-6 review finding). Streams with
                # leading junk miss the offset-0 sniff, so a bounded
                # window scan (round-6 ADVICE) catches those too.
                if _sniff_type(raw) == "audio/mpeg" or (
                    raw[:4] != b"\x1a\x45\xdf\xa3"
                    and raw[4:8] != b"ftyp"
                    and _mpeg_sync_near_start(raw)
                ):
                    from dmshadoop_spark.multimodal.containers import (
                        mp3_frames,
                    )

                    try:
                        walk = mp3_frames(raw)
                        n = len(walk)
                        stride = _sample_stride(
                            n, walk[-1]["ts_sec"], every_s
                        )
                        for i in range(0, n, stride):
                            fr = walk[i]
                            emit(
                                path,
                                i,
                                fr["ts_sec"],
                                raw[fr["offset"] : fr["offset"] + fr["length"]],
                                True,
                            )
                        continue
                    except ValueError:
                        pass  # sync-less/garbled stream → stub path
                if _sniff_type(raw) == "audio/aac":
                    # AAC ADTS (round 11): same real-frame emission as
                    # the MPEG-audio branch — the sniffer's two-frame
                    # discipline already vetted the stream
                    from dmshadoop_spark.multimodal.containers import (
                        adts_frames,
                    )

                    try:
                        walk = adts_frames(raw)
                        n = len(walk)
                        stride = _sample_stride(
                            n, walk[-1]["ts_sec"], every_s
                        )
                        for i in range(0, n, stride):
                            fr = walk[i]
                            emit(
                                path,
                                i,
                                fr["ts_sec"],
                                raw[fr["offset"] : fr["offset"] + fr["length"]],
                                True,
                            )
                        continue
                    except ValueError:
                        pass  # garbled stream → stub path
                if raw[:4] == b"\x1a\x45\xdf\xa3":
                    from dmshadoop_spark.multimodal.ebml import (
                        mkv_blocks,
                        parse_mkv,
                    )

                    try:
                        meta = parse_mkv(raw)
                        vids = {
                            t["number"]
                            for t in meta["tracks"]
                            if t.get("type") == "video"
                        }
                        blocks = [
                            b for b in mkv_blocks(raw) if b["track"] in vids
                        ]
                        if blocks:
                            blocks.sort(key=lambda b: b["ts_ms"])
                            n = len(blocks)
                            stride = _sample_stride(
                                n, blocks[-1]["ts_ms"] / 1000.0, every_s
                            )
                            for i in range(0, n, stride):
                                emit(
                                    path,
                                    i,
                                    blocks[i]["ts_ms"] / 1000.0,
                                    blocks[i]["frame"],
                                    True,
                                )
                            continue
                    except ValueError:
                        pass  # malformed/cluster-free mkv → stub path
                if raw[:4] == b"RIFF" and raw[8:12] == b"WEBP":
                    from dmshadoop_spark.multimodal.webp import (
                        webp_anim_frames,
                    )

                    try:
                        anim = webp_anim_frames(raw)
                    except (ValueError, NotImplementedError):
                        anim = []
                    if anim:
                        # cumulative ANMF durations are the container
                        # timestamps; each emitted frame is a standalone
                        # lossless webp (decode_image-ready downstream,
                        # the MJPEG-frames-are-JPEGs pattern)
                        n = len(anim)
                        ts_ms = 0
                        starts = []
                        for f in anim:
                            starts.append(ts_ms)
                            ts_ms += f["duration_ms"]
                        # span = last frame's START time, the shared
                        # _sample_stride convention across containers
                        stride = _sample_stride(
                            n, starts[-1] / 1000.0, every_s
                        )
                        for i in range(0, n, stride):
                            emit(
                                path,
                                i,
                                starts[i] / 1000.0,
                                anim[i]["payload"],
                                True,
                            )
                        continue
                    # still webp is an image, not a video → stub path
                if raw[4:8] == b"ftyp":
                    from dmshadoop_spark.multimodal.containers import parse_mp4

                    try:
                        parsed = parse_mp4(raw)
                        vid = next(
                            t for t in parsed["tracks"] if t["handler"] == "vide"
                        )
                        samples = vid["samples"]
                        n = len(samples)
                        stride = _sample_stride(
                            n, samples[-1][2] if n else 0.0, every_s
                        )
                        for i in range(0, n, stride):
                            off, size, ts = samples[i]
                            emit(path, i, ts, raw[off : off + size], True)
                        continue
                    except (ValueError, StopIteration):
                        pass  # malformed/audio-only mp4 → stub path
                duration = len(raw) / bytes_per_s
                n_frames = int(duration / every_s) + 1
                for i in range(n_frames):
                    emit(
                        path,
                        i,
                        i * every_s,
                        hashlib.sha256(raw + i.to_bytes(4, "big")).digest(),
                        False,
                    )
            yield pd.DataFrame(
                {
                    "path": out_path,
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "ts_sec": pd.Series(out_ts, dtype="float64"),
                    "frame": out_frame,
                    "real": pd.Series(out_real, dtype="bool"),
                }
            )

    return binary_df.select("path", "content").mapInPandas(
        work, schema=FRAMES_SCHEMA
    )


# --------------------------------------------------------------------------
# REAL GIF codec: LZW decode (GIF87a/89a, incl. interlace + local palettes)
# and a spec-valid LZW encoder — the third real image path beside PNG/JPEG.
# --------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> "np.ndarray":
    """GIF-variant LZW: variable code width (min+1 .. 12 bits, LSB-first
    packing), CLEAR resets the table, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                bits = 0
                acc = 0
                break
            if prev is None:
                if code >= len(table):
                    raise ValueError("LZW: first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW: code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
    if len(out) < n_pixels:
        raise ValueError("LZW: truncated pixel stream")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(indices: "np.ndarray", min_code_size: int) -> bytes:
    """Spec-valid GIF LZW compressor (greedy longest-match table build,
    emits CLEAR when the table fills to keep codes <= 12 bits)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for px in bytes(indices.astype(np.uint8).tobytes()):
        cand = run + bytes([px])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = min_code_size + 1
        run = bytes([px])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


@_valueerror_on_malformed
def decode_gif(content: bytes) -> "np.ndarray":
    """Real GIF decode: header + logical screen descriptor + palette walk,
    extension skip, LZW expand of the FIRST image (incl. interlace and
    local color tables) → HxWx3 uint8. Raises ValueError on malformed
    streams, NotImplementedError when the first frame is absent."""
    data = bytes(content)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n

    def skip_subblocks(j: int) -> int:
        while True:
            if j >= len(data):
                raise ValueError("GIF: unterminated sub-blocks")
            size = data[j]
            j += 1
            if size == 0:
                return j
            j += size

    while i < len(data):
        block = data[i]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            i = skip_subblocks(i + 2)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        x0, y0, w, h, iflags = struct.unpack("<HHHHB", data[i + 1 : i + 10])
        i += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(data[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
            i += 3 * n
        if pal is None:
            raise ValueError("GIF image without any color table")
        min_code_size = data[i]
        i += 1
        lzw = bytearray()
        while True:
            size = data[i]
            i += 1
            if size == 0:
                break
            lzw += data[i : i + size]
            i += size
        if not (0 < w and 0 < h and w * h <= 64_000_000):
            raise ValueError(f"implausible GIF dimensions {w}x{h}")
        idx = _lzw_decode(bytes(lzw), min_code_size, w * h)
        if (idx >= len(pal)).any():
            raise ValueError("GIF: pixel index outside color table")
        rows = idx.reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            ordered = np.empty_like(rows)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for y in range(start, h, step):
                    ordered[y] = rows[src]
                    src += 1
            rows = ordered
        return pal[rows]
    raise NotImplementedError("GIF contains no image data block")


def encode_gif(arr: "np.ndarray") -> bytes:
    """Spec-valid single-frame GIF89a from an HxWx3 uint8 array whose
    distinct colors fit a 256-entry palette (built deterministically in
    first-appearance order); real LZW compression."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_gif expects an HxWx3 uint8 array")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"encode_gif: {len(colors)} colors exceed a GIF palette")
    # palette in first-appearance order (np.unique sorts — remap)
    first_pos = np.full(len(colors), len(flat), dtype=np.int64)
    np.minimum.at(first_pos, idx, np.arange(len(flat)))
    order = np.argsort(first_pos, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    palette = colors[order]
    indices = rank[idx].astype(np.uint8)
    pal_bits = max(1, int(len(palette) - 1).bit_length())
    pal_n = 1 << pal_bits
    pal_bytes = palette.tobytes() + b"\x00" * (3 * (pal_n - len(palette)))
    min_code_size = max(2, pal_bits)
    lzw = _lzw_encode(indices, min_code_size)
    blocks = b"".join(
        bytes([len(lzw[j : j + 255])]) + lzw[j : j + 255]
        for j in range(0, len(lzw), 255)
    )
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
        + pal_bytes
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code_size])
        + blocks
        + b"\x00\x3b"
    )
