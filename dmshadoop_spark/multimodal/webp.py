"""Pure-python/numpy lossless WebP (VP8L) codec.

Implements the public WebP Lossless Bitstream Specification (RFC 9649):
LSB-first bitstream, canonical prefix codes (read MSB-of-code-first, the
DEFLATE convention), LZ77 backward references with the 2D near-distance
map, an optional color cache, meta prefix-code groups via an entropy
image, and all four transforms (predictor / color / subtract-green /
color-indexing with sub-byte bundling).

Closes the last image-format gap the engine carried: ``decode_image``
(binary.py) raised NotImplementedError for webp, routing payloads to the
``real=false`` fallback featurizer. VP8L is *lossless*, so — exactly like
FLAC (multimodal/flac.py) — ``decode(encode(x)) == x`` pixel-exactly and
the x6_webp_roundtrip query (queries/llm.py) can run under a FULL value
oracle: DuckDB recomputes per-channel integer statistics from the same
closed-form synthetic signal and the driver hash-compares.

Reference parity: hachoir read container metadata only (src/DMS.py:70-91,
and webp postdates the reference's toolchain entirely); this decoder goes
past it to real pixels, which is what the image feature / near-dup /
thumbnail tier consumes.

Encoder scope (spec-valid output, tuned for determinism over ratio):
  * transforms: subtract-green + per-block predictor (single mode,
    entropy-coded mode subimage);
  * LZ77 runs against distance 1 (previous pixel) and distance ``width``
    (pixel above) — the two dominant run shapes in real rasters — emitted
    through the scalar distance path (code = dist + 120);
  * per-image canonical Huffman codes for all five alphabets, with the
    simple two-symbol header where it fits and RLE-coded length arrays
    (symbols 16/17/18) otherwise; no color cache, no entropy image.
Decoder scope: the full spec surface listed above, so third-party VP8L
streams decode too (lossy VP8/VP8X-wrapped-VP8 raise NotImplementedError
with the same documented codec-family contract as webp had before).
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

__all__ = [
    "decode_webp",
    "encode_webp_anim",
    "encode_webp_lossless",
    "webp_anim_frames",
    "webp_dimensions",
]

_SIG = 0x2F

# Order in which code-length-code lengths are stored (RFC 9649 §5.2.2).
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D near-distance map: the first 120 decoded distance values address
# (dx, dy) neighbor offsets; scalar distances start at 121 (RFC 9649
# §4.2.2.3). distance = dy * width + dx, clamped to >= 1.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (0, 8), (1, 8), (-1, 8), (3, 8), (-3, 8), (8, 4), (8, 5), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 6), (8, 7),
)


# ---------------------------------------------------------------------------
# bit I/O (LSB-first at the byte level, like DEFLATE)


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        v = 0
        p = self.pos
        for i in range(n):
            v |= ((self.data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Emit a canonical prefix code MSB-first (tree-descent order)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        out = bytes(self.buf)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


# ---------------------------------------------------------------------------
# canonical prefix codes


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical assignment."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out: dict[int, tuple[int, int]] = {}
    for sym, l in enumerate(lengths):
        if l:
            out[sym] = (next_code[l], l)
            next_code[l] += 1
    return out


class _PrefixDecoder:
    """Bit-at-a-time canonical prefix decoder. A code whose alphabet has
    exactly one used symbol consumes ZERO bits per read (the spec's
    simple-code degenerate case; libwebp behaves identically)."""

    __slots__ = ("table", "single", "max_len")

    def __init__(self, lengths: list[int]):
        used = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("VP8L: empty prefix code")
        if len(used) == 1:
            self.single = used[0][0]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        codes = _canonical_codes(lengths)
        self.table = {(l, c): s for s, (c, l) in codes.items()}
        self.max_len = max(l for _, l in used)
        # completeness check (Kraft equality) — a malformed code would
        # otherwise loop forever below
        if sum(1 << (self.max_len - l) for _, l in used) != 1 << self.max_len:
            raise ValueError("VP8L: prefix code not complete")

    def read(self, r: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | r.read_bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code bits")


def _read_prefix_code(r: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    lengths = [0] * alphabet_size
    if r.read_bit():  # simple code
        num_symbols = r.read_bit() + 1
        first_8bit = r.read_bit()
        sym0 = r.read(8 if first_8bit else 1)
        lengths[sym0] = 1
        if num_symbols == 2:
            sym1 = r.read(8)
            lengths[sym1] = 1
        return _PrefixDecoder(lengths)
    # normal: code-length code, then RLE-coded lengths
    num_clc = r.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = r.read(3)
    clc = _PrefixDecoder(clc_lengths)
    if r.read_bit():  # bounded max_symbol
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = clc.read(r)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            for _ in range(3 + r.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + r.read(3)
        else:  # 18
            i += 11 + r.read(7)
    if i > alphabet_size:
        raise ValueError("VP8L: code lengths overflow alphabet")
    return _PrefixDecoder(lengths)


# ---------------------------------------------------------------------------
# LZ77 length/distance prefix-value coding (RFC 9649 §4.2.2.2)


def _lz77_value(r: _BitReader, prefix_code: int) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra_bits = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra_bits
    return offset + r.read(extra_bits) + 1


def _lz77_encode(value: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_value, extra_bits); inverse of
    _lz77_value."""
    if value <= 4:
        return value - 1, 0, 0
    x = value - 1
    p = x.bit_length() - 1
    if x >= 3 << (p - 1):
        code = 2 * p + 1
        extra = x - (3 << (p - 1))
    else:
        code = 2 * p
        extra = x - (1 << p)
    return code, extra, (code - 2) >> 1


# ---------------------------------------------------------------------------
# decoder


class _CodeGroup:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, r: _BitReader, cache_size: int):
        self.green = _read_prefix_code(r, 256 + 24 + cache_size)
        self.red = _read_prefix_code(r, 256)
        self.blue = _read_prefix_code(r, 256)
        self.alpha = _read_prefix_code(r, 256)
        self.dist = _read_prefix_code(r, 40)


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image_stream(
    r: _BitReader, xsize: int, ysize: int, level0: bool
) -> "np.ndarray":
    """Decode one (possibly entropy-only) VP8L image stream to a uint32
    ARGB array of shape (ysize, xsize). For level0, transforms are read
    and inverse-applied before returning (the returned xsize is the FULL
    image width even when color-indexing bundling shrank the coded
    width)."""
    transforms = []  # (type, data...) in read order
    final_xsize = xsize
    if level0:
        seen = set()
        while r.read_bit():
            ttype = r.read(2)
            if ttype in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(ttype)
            if ttype == 0:  # predictor
                bits = r.read(3) + 2
                sub = _decode_image_stream(
                    r, _sub_size(xsize, bits), _sub_size(ysize, bits), False
                )
                transforms.append(("predictor", bits, sub))
            elif ttype == 1:  # color transform
                bits = r.read(3) + 2
                sub = _decode_image_stream(
                    r, _sub_size(xsize, bits), _sub_size(ysize, bits), False
                )
                transforms.append(("color", bits, sub))
            elif ttype == 2:
                transforms.append(("subtract_green",))
            else:  # color indexing
                n_colors = r.read(8) + 1
                palette_img = _decode_image_stream(r, n_colors, 1, False)
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(
                    ("palette", width_bits, n_colors, palette_img[0])
                )
                xsize = _sub_size(xsize, width_bits)

    cache_bits = r.read(4) if r.read_bit() else 0
    if cache_bits > 11:
        raise ValueError("VP8L: color cache too large")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    groups_img = None
    prefix_bits = 0
    n_groups = 1
    if level0 and r.read_bit():  # entropy image (meta prefix codes)
        prefix_bits = r.read(3) + 2
        groups_img = _decode_image_stream(
            r, _sub_size(xsize, prefix_bits), _sub_size(ysize, prefix_bits),
            False,
        )
        n_groups = int(((groups_img >> 8) & 0xFFFF).max()) + 1
    groups = [_CodeGroup(r, cache_size) for _ in range(n_groups)]

    n_pixels = xsize * ysize
    pix = np.zeros(n_pixels, dtype=np.uint64)  # uint64 avoids np overflow
    i = 0
    g = groups[0]
    while i < n_pixels:
        if groups_img is not None:
            x, y = i % xsize, i // xsize
            meta = int(
                groups_img[y >> prefix_bits, x >> prefix_bits]
            )
            g = groups[(meta >> 8) & 0xFFFF]
        sym = g.green.read(r)
        if sym < 256:
            red = g.red.read(r)
            blue = g.blue.read(r)
            alpha = g.alpha.read(r)
            p = (alpha << 24) | (red << 16) | (sym << 8) | blue
            pix[i] = p
            if cache_size:
                cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p
            i += 1
        elif sym < 280:  # backward reference
            length = _lz77_value(r, sym - 256)
            dist_value = _lz77_value(r, g.dist.read(r))
            if dist_value > 120:
                dist = dist_value - 120
            else:
                dx, dy = _DIST_MAP[dist_value - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > i or i + length > n_pixels:
                raise ValueError("VP8L: backward reference out of range")
            for k in range(length):
                p = int(pix[i - dist + k])
                pix[i + k] = p
                if cache_size:
                    cache[
                        (0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = p
            i += length
        else:  # color cache hit
            idx = sym - 280
            if idx >= cache_size:
                raise ValueError("VP8L: cache index out of range")
            pix[i] = cache[idx]
            i += 1

    img = pix.astype(np.uint32).reshape(ysize, xsize)
    # inverse transforms, reverse of read order
    for t in reversed(transforms):
        if t[0] == "palette":
            img = _inverse_palette(img, t[1], t[2], t[3], final_xsize)
        elif t[0] == "subtract_green":
            img = _inverse_subtract_green(img)
        elif t[0] == "color":
            img = _inverse_color_transform(img, t[1], t[2])
        else:
            img = _inverse_predictor(img, t[1], t[2])
    return img


def _split(img: "np.ndarray") -> tuple:
    return (img >> 24) & 0xFF, (img >> 16) & 0xFF, (img >> 8) & 0xFF, img & 0xFF


def _join(a, r, g, b) -> "np.ndarray":
    return (
        (a.astype(np.uint32) << 24)
        | (r.astype(np.uint32) & 0xFF) << 16
        | (g.astype(np.uint32) & 0xFF) << 8
        | (b.astype(np.uint32) & 0xFF)
    )


def _inverse_subtract_green(img: "np.ndarray") -> "np.ndarray":
    a, r, g, b = _split(img)
    return _join(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _inverse_color_transform(
    img: "np.ndarray", bits: int, sub: "np.ndarray"
) -> "np.ndarray":
    h, w = img.shape
    ys = (np.arange(h) >> bits)[:, None]
    xs = (np.arange(w) >> bits)[None, :]
    cte = sub[ys, xs]
    # element packing: green_to_red in the blue byte, green_to_blue in the
    # green byte, red_to_blue in the red byte (RFC 9649 §4.2.1.2)
    g2r = (cte & 0xFF).astype(np.int64).astype(np.int8).astype(np.int64)
    g2b = ((cte >> 8) & 0xFF).astype(np.int64).astype(np.int8).astype(np.int64)
    r2b = ((cte >> 16) & 0xFF).astype(np.int64).astype(np.int8).astype(np.int64)
    a, r, g, b = (c.astype(np.int64) for c in _split(img))
    g_s = g.astype(np.int8).astype(np.int64)
    r = (r + ((g2r * g_s) >> 5)) & 0xFF
    r_s = r.astype(np.uint8).astype(np.int8).astype(np.int64)
    b = (b + ((g2b * g_s) >> 5)) & 0xFF
    b = (b + ((r2b * r_s) >> 5)) & 0xFF
    return _join(a, r, g, b)


def _inverse_palette(
    img: "np.ndarray", width_bits: int, n_colors: int, palette_deltas, xsize: int
) -> "np.ndarray":
    # palette row is delta-coded per channel
    pal = np.zeros(n_colors, dtype=np.uint32)
    acc = np.zeros(4, dtype=np.uint32)
    for j in range(n_colors):
        a, r, g, b = (
            (int(palette_deltas[j]) >> s) & 0xFF for s in (24, 16, 8, 0)
        )
        acc = (acc + np.array([a, r, g, b], dtype=np.uint32)) & 0xFF
        pal[j] = (
            (int(acc[0]) << 24) | (int(acc[1]) << 16)
            | (int(acc[2]) << 8) | int(acc[3])
        )
    h = img.shape[0]
    idx = ((img >> 8) & 0xFF).astype(np.int64)
    if width_bits == 0:
        out_idx = idx
    else:
        ppb = 1 << width_bits
        bpi = 8 >> width_bits
        mask = (1 << bpi) - 1
        cols = []
        for j in range(ppb):
            cols.append((idx >> (j * bpi)) & mask)
        out_idx = np.stack(cols, axis=2).reshape(h, -1)
    out_idx = out_idx[:, :xsize]
    # out-of-range indices decode as transparent black (spec)
    safe = np.where(out_idx < n_colors, out_idx, 0)
    out = pal[safe]
    out[out_idx >= n_colors] = 0
    return out


def _avg2(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
    return (a + b) >> 1


def _predict(mode: int, L, T, TL, TR) -> "np.ndarray":
    """Per-channel predictor over int64[4] channel vectors."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int64)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        p = L + T - TL
        pl = int(np.abs(p - L).sum())
        pt = int(np.abs(p - T).sum())
        return L if pl < pt else T
    if mode == 12:
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:
        a = _avg2(L, T)
        d = a - TL
        # C-style truncation toward zero for (a - b) / 2
        half = np.where(d >= 0, d >> 1, -((-d) >> 1))
        return np.clip(a + half, 0, 255)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _px_channels(img: "np.ndarray", y: int, x: int) -> "np.ndarray":
    p = int(img[y, x])
    return np.array(
        [(p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF],
        dtype=np.int64,
    )


def _inverse_predictor(
    img: "np.ndarray", bits: int, sub: "np.ndarray"
) -> "np.ndarray":
    h, w = img.shape
    out = img.copy()
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = _px_channels(out, 0, x - 1)  # top row: L
            elif x == 0:
                pred = _px_channels(out, y - 1, 0)  # left column: T
            else:
                mode = (int(sub[y >> bits, x >> bits]) >> 8) & 0xFF
                L = _px_channels(out, y, x - 1)
                T = _px_channels(out, y - 1, x)
                TL = _px_channels(out, y - 1, x - 1)
                # rightmost column: TR is the leftmost pixel of the
                # CURRENT row (already reconstructed; RFC 9649 §4.2.1.1)
                TR = (
                    _px_channels(out, y - 1, x + 1)
                    if x + 1 < w
                    else _px_channels(out, y, 0)
                )
                pred = _predict(mode, L, T, TL, TR)
            res = _px_channels(img, y, x)
            v = (res + pred) & 0xFF
            out[y, x] = (
                (int(v[0]) << 24) | (int(v[1]) << 16)
                | (int(v[2]) << 8) | int(v[3])
            )
    return out


# ---------------------------------------------------------------------------
# container


def _vp8l_payload(content: bytes) -> bytes:
    if len(content) < 20 or content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    n = len(content)
    while pos + 8 <= n:
        tag = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return body
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 webp needs a DCT/bool-coder decoder; only "
                "lossless VP8L ships in-container (codec-family contract, "
                "see multimodal/binary.py)"
            )
        if tag == b"ANMF" and len(body) >= 16:
            # animated: still-image semantics = first frame (the GIF
            # convention); frame walks go through webp_anim_frames
            ipos = 16
            while ipos + 8 <= len(body):
                itag = body[ipos : ipos + 4]
                (isize,) = struct.unpack("<I", body[ipos + 4 : ipos + 8])
                if itag == b"VP8L":
                    return body[ipos + 8 : ipos + 8 + isize]
                ipos += 8 + isize + (isize & 1)
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("WebP: no VP8L chunk")


def decode_webp(content: bytes) -> "np.ndarray":
    """Decode a lossless WebP payload to an HxWx4 uint8 RGBA array."""
    body = _vp8l_payload(bytes(content))
    if not body or body[0] != _SIG:
        raise ValueError("VP8L: bad signature byte")
    r = _BitReader(body[1:])
    width = r.read(14) + 1
    height = r.read(14) + 1
    r.read(1)  # alpha_is_used hint (informative)
    if r.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    img = _decode_image_stream(r, width, height, True)
    a, red, g, b = _split(img)
    return np.stack([red, g, b, a], axis=2).astype(np.uint8)


def decode_webp_rgb(content: bytes) -> "np.ndarray":
    """HxWx3 RGB view (alpha dropped) — the decode_image dispatch shape."""
    return decode_webp(content)[:, :, :3]


def webp_dimensions(content: bytes) -> tuple[int, int] | None:
    """(width, height) from the VP8L header, or None if unparsable."""
    try:
        body = _vp8l_payload(bytes(content))
    except (ValueError, NotImplementedError):
        return None
    if len(body) < 5 or body[0] != _SIG:
        return None
    r = _BitReader(body[1:])
    return r.read(14) + 1, r.read(14) + 1


# ---------------------------------------------------------------------------
# animation (WebP Container Specification: VP8X / ANIM / ANMF chunks)


def _chunk(tag: bytes, body: bytes) -> bytes:
    out = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def _u24(v: int) -> bytes:
    return struct.pack("<I", v)[:3]


def webp_anim_frames(content: bytes) -> list[dict]:
    """Walk an animated WebP's ANMF chunks. Each entry:
    {x, y, width, height, duration_ms, payload} where ``payload`` is the
    frame's VP8L stream re-wrapped as a STANDALONE webp container, so
    downstream consumers reuse ``decode_webp`` / ``decode_image``
    unchanged (the MJPEG-frames-are-JPEGs pattern, sample_frames'
    contract). Returns [] for still webp; raises ValueError on a
    non-webp payload."""
    content = bytes(content)
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    frames: list[dict] = []
    pos = 12
    n = len(content)
    while pos + 8 <= n:
        tag = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + size]
        if tag == b"ANMF" and len(body) >= 16:
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            dur = int.from_bytes(body[12:15], "little")
            # body[15] = reserved|blend|dispose flags (ignored: our
            # frames are full-canvas, no compositing needed)
            ipos = 16
            payload = None
            while ipos + 8 <= len(body):
                itag = body[ipos : ipos + 4]
                (isize,) = struct.unpack("<I", body[ipos + 4 : ipos + 8])
                ibody = body[ipos + 8 : ipos + 8 + isize]
                if itag == b"VP8L":
                    riff = b"WEBP" + _chunk(b"VP8L", ibody)
                    payload = b"RIFF" + struct.pack("<I", len(riff)) + riff
                    break
                if itag == b"VP8 ":
                    raise NotImplementedError(
                        "animated webp with lossy VP8 frames (codec-family "
                        "contract: only lossless VP8L decodes in-container)"
                    )
                ipos += 8 + isize + (isize & 1)
            if payload is not None:
                frames.append(
                    {
                        "x": fx,
                        "y": fy,
                        "width": fw,
                        "height": fh,
                        "duration_ms": dur,
                        "payload": payload,
                    }
                )
        pos += 8 + size + (size & 1)
    return frames


def encode_webp_anim(
    frames: list["np.ndarray"],
    durations_ms: list[int] | int = 100,
    loop: int = 0,
) -> bytes:
    """Mux RGB(A) frames into an animated WebP: VP8X (animation flag) +
    ANIM + one ANMF per frame, each frame VP8L-lossless-encoded at the
    full canvas. ``durations_ms`` is per-frame or a scalar."""
    if not frames:
        raise ValueError("need at least one frame")
    if isinstance(durations_ms, int):
        durations_ms = [durations_ms] * len(frames)
    if len(durations_ms) != len(frames):
        raise ValueError("durations_ms/frames length mismatch")
    h, w = frames[0].shape[:2]
    has_alpha = any(f.shape[2] == 4 for f in frames)
    flags = 0x02 | (0x10 if has_alpha else 0)  # ANIMATION (+ALPHA)
    vp8x = bytes([flags]) + b"\x00\x00\x00" + _u24(w - 1) + _u24(h - 1)
    anim = struct.pack("<I", 0) + struct.pack("<H", loop)  # bg BGRA + loop
    body = _chunk(b"VP8X", vp8x) + _chunk(b"ANIM", anim)
    for f, dur in zip(frames, durations_ms):
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must match the canvas size")
        still = encode_webp_lossless(f)
        vp8l_body = _vp8l_payload(still)
        anmf = (
            _u24(0) + _u24(0)  # frame offset x/2, y/2
            + _u24(w - 1) + _u24(h - 1)
            + _u24(int(dur)) + b"\x00"  # flags: blend, dispose-none
            + _chunk(b"VP8L", vp8l_body)
        )
        body += _chunk(b"ANMF", anmf)
    riff = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# encoder


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Canonical Huffman code lengths from symbol frequencies, depth
    limited to max_len (flat two-level fallback when the optimal tree is
    too deep — valid + complete, just not minimal)."""
    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    i = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i, s1 + s2))
        i += 1
    if max(depth.values()) <= max_len:
        return depth
    # fallback: n_short symbols at L-1, rest at L (complete by Kraft)
    n = len(syms)
    L = max(1, (n - 1).bit_length())
    n_short = (1 << L) - n
    return {
        s: (L - 1 if j < n_short and L > 1 else L)
        for j, s in enumerate(syms)
    }


def _rle_code_lengths(lengths: list[int]) -> list[tuple[int, int, int]]:
    """(symbol, extra_value, extra_bits) stream over the code-length
    alphabet 0..18 with the spec's RLE symbols 16/17/18."""
    out: list[tuple[int, int, int]] = []
    i = 0
    n = len(lengths)
    prev = -1
    while i < n:
        v = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == v:
            run += 1
        if v == 0:
            left = run
            while left >= 11:
                take = min(left, 138)
                out.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                out.append((17, take - 3, 3))
                left -= take
            for _ in range(left):
                out.append((0, 0, 0))
        else:
            start = 0
            if v != prev:
                out.append((v, 0, 0))
                start = 1
                prev = v
            left = run - start
            while left >= 3:
                take = min(left, 6)
                out.append((16, take - 3, 2))
                left -= take
            for _ in range(left):
                out.append((v, 0, 0))
        i += run
    return out


def _write_prefix_code(
    w: _BitWriter, lengths: list[int]
) -> dict[int, tuple[int, int]]:
    """Write a prefix-code header for the given length array; return the
    symbol->(code,length) map for payload emission."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(used) <= 2 and all(s <= 255 for s in used):
        w.write(1, 1)  # simple
        w.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 <= 1:
            w.write(0, 1)
            w.write(s0, 1)
        else:
            w.write(1, 1)
            w.write(s0, 8)
        if len(used) == 2:
            w.write(used[1], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        return {used[0]: (0, 1), used[1]: (1, 1)}
    w.write(0, 1)  # normal
    rle = _rle_code_lengths(lengths)
    clc_freq: dict[int, int] = {}
    for sym, _, _ in rle:
        clc_freq[sym] = clc_freq.get(sym, 0) + 1
    clc_len_map = _huffman_lengths(clc_freq, 7)
    clc_lengths = [clc_len_map.get(s, 0) for s in range(19)]
    # single-symbol CLC: give it length 1 explicitly? _PrefixDecoder
    # treats single-symbol as 0-bit; the writer below mirrors that.
    num_clc = 0
    for i, s in enumerate(_CLC_ORDER):
        if clc_lengths[s] > 0:
            num_clc = i + 1
    num_clc = max(num_clc, 4)
    w.write(num_clc - 4, 4)
    for i in range(num_clc):
        w.write(clc_lengths[_CLC_ORDER[i]], 3)
    w.write(0, 1)  # no max_symbol bound
    clc_codes = _canonical_codes(clc_lengths)
    clc_single = len([l for l in clc_lengths if l]) == 1
    for sym, extra, ebits in rle:
        if not clc_single:
            c, l = clc_codes[sym]
            w.write_code(c, l)
        if ebits:
            w.write(extra, ebits)
    return {s: c for s, c in _canonical_codes(lengths).items()}


def _emit(w, codes, single, sym):
    if not single:
        c, l = codes[sym]
        w.write_code(c, l)


def _encode_image_stream(
    w: _BitWriter, pix: list[int], xsize: int, use_lz77: bool
) -> None:
    """Entropy-code a pixel stream (ARGB ints): optional dist-1/dist-xsize
    run LZ77, one prefix-code group, no cache. Used for both the main
    (post-transform) image and transform subimages (caller writes the
    transform headers / cache / meta bits around this)."""
    tokens: list[tuple] = []  # ("lit", p) | ("copy", length, dist)
    n = len(pix)
    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if use_lz77:
            for dist in (1, xsize):
                if dist == 0 or i < dist:
                    continue
                m = 0
                cap = min(n - i, 4096)
                while m < cap and pix[i + m] == pix[i + m - dist]:
                    m += 1
                if m > best_len:
                    best_len, best_dist = m, dist
        if best_len >= 4:
            tokens.append(("copy", best_len, best_dist))
            i += best_len
        else:
            tokens.append(("lit", pix[i]))
            i += 1

    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            gf[(p >> 8) & 0xFF] = gf.get((p >> 8) & 0xFF, 0) + 1
            rf[(p >> 16) & 0xFF] = rf.get((p >> 16) & 0xFF, 0) + 1
            bf[p & 0xFF] = bf.get(p & 0xFF, 0) + 1
            af[(p >> 24) & 0xFF] = af.get((p >> 24) & 0xFF, 0) + 1
        else:
            lc, _, _ = _lz77_encode(t[1])
            gf[256 + lc] = gf.get(256 + lc, 0) + 1
            dc, _, _ = _lz77_encode(t[2] + 120)  # scalar distance path
            df[dc] = df.get(dc, 0) + 1
    for fr in (gf, rf, bf, af, df):
        if not fr:
            fr[0] = 1  # never-read code still needs a valid header

    alphabet = {"g": 280, "r": 256, "b": 256, "a": 256, "d": 40}
    lens = {
        k: _huffman_lengths(fr, 15)
        for k, fr in (("g", gf), ("r", rf), ("b", bf), ("a", af), ("d", df))
    }
    codes = {}
    single = {}
    for k in ("g", "r", "b", "a", "d"):
        arr = [lens[k].get(s, 0) for s in range(alphabet[k])]
        codes[k] = _write_prefix_code(w, arr)
        single[k] = sum(1 for l in arr if l) == 1

    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            _emit(w, codes["g"], single["g"], (p >> 8) & 0xFF)
            _emit(w, codes["r"], single["r"], (p >> 16) & 0xFF)
            _emit(w, codes["b"], single["b"], p & 0xFF)
            _emit(w, codes["a"], single["a"], (p >> 24) & 0xFF)
        else:
            lc, lex, leb = _lz77_encode(t[1])
            _emit(w, codes["g"], single["g"], 256 + lc)
            if leb:
                w.write(lex, leb)
            dc, dex, deb = _lz77_encode(t[2] + 120)
            _emit(w, codes["d"], single["d"], dc)
            if deb:
                w.write(dex, deb)


def _forward_predictor(
    img: "np.ndarray", bits: int, mode: int
) -> "np.ndarray":
    """Residual image for a single predictor mode applied per block
    (modes stored per block in the subimage the encoder also writes).
    Mirrors _inverse_predictor's border rules exactly."""
    h, w = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = _px_channels(img, 0, x - 1)
            elif x == 0:
                pred = _px_channels(img, y - 1, 0)
            else:
                L = _px_channels(img, y, x - 1)
                T = _px_channels(img, y - 1, x)
                TL = _px_channels(img, y - 1, x - 1)
                TR = (
                    _px_channels(img, y - 1, x + 1)
                    if x + 1 < w
                    else _px_channels(img, y, 0)
                )
                pred = _predict(mode, L, T, TL, TR)
            cur = _px_channels(img, y, x)
            v = (cur - pred) & 0xFF
            out[y, x] = (
                (int(v[0]) << 24) | (int(v[1]) << 16)
                | (int(v[2]) << 8) | int(v[3])
            )
    return out


def _forward_subtract_green(img: "np.ndarray") -> "np.ndarray":
    a, r, g, b = _split(img)
    return _join(a, (r - g) & 0xFF, g, (b - g) & 0xFF)


def encode_webp_lossless(
    arr: "np.ndarray", predictor_mode: int = 2, predictor_bits: int = 4
) -> bytes:
    """Encode an HxWx3 RGB (or HxWx4 RGBA) uint8 array as a lossless WebP.

    Pipeline: subtract-green -> per-block predictor residuals (single
    ``predictor_mode`` for every block, mode subimage entropy-coded like
    any VP8L transform image) -> run-LZ77 + canonical Huffman. Bit-exact
    round-trip with decode_webp (lossless; pinned in tests/test_webp.py).
    """
    a = np.asarray(arr)
    if a.ndim != 3 or a.shape[2] not in (3, 4) or a.dtype != np.uint8:
        raise ValueError("expected HxWx3 or HxWx4 uint8 array")
    h, w_px = a.shape[:2]
    if not (1 <= w_px <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be 1..16384")
    alpha = (
        a[:, :, 3].astype(np.uint32)
        if a.shape[2] == 4
        else np.full((h, w_px), 255, np.uint32)
    )
    img = _join(
        alpha,
        a[:, :, 0].astype(np.uint32),
        a[:, :, 1].astype(np.uint32),
        a[:, :, 2].astype(np.uint32),
    )

    w = _BitWriter()
    w.write(w_px - 1, 14)
    w.write(h - 1, 14)
    w.write(1 if a.shape[2] == 4 else 0, 1)
    w.write(0, 3)  # version

    # transforms, in stream order [subtract_green, predictor]: the decoder
    # inverse-applies in reverse, i.e. predictor first then add-green —
    # matching this forward order (sub-green THEN predictor residuals)
    w.write(1, 1)
    w.write(2, 2)  # subtract green
    img = _forward_subtract_green(img)

    w.write(1, 1)
    w.write(0, 2)  # predictor
    w.write(predictor_bits - 2, 3)
    sub_w = _sub_size(w_px, predictor_bits)
    sub_h = _sub_size(h, predictor_bits)
    mode_pix = [0xFF000000 | (predictor_mode << 8)] * (sub_w * sub_h)
    # subimage stream: cache bit + one code group (no meta bit: level0=0)
    w.write(0, 1)  # no color cache
    _encode_image_stream(w, mode_pix, sub_w, use_lz77=True)
    img = _forward_predictor(img, predictor_bits, predictor_mode)

    w.write(0, 1)  # end of transforms
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no entropy image (single prefix group)
    _encode_image_stream(
        w, [int(p) for p in img.reshape(-1)], w_px, use_lz77=True
    )

    body = bytes([_SIG]) + w.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
