"""Lossless WebP (VP8L) codec tests — multimodal/webp.py.

Strategy mirrors test_flac.py: the codec is lossless, so encode->decode
round-trips must be PIXEL-EXACT across every predictor mode and image
shape; decoder-only spec surface (color cache, color-indexing with
bundling, cross-color transform, meta prefix groups via an entropy
image, the 2D near-distance map) is exercised with hand-assembled
bitstreams whose expected pixels are computed independently in the test.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dmshadoop_spark.multimodal.webp import (
    _SIG,
    _BitWriter,
    _encode_image_stream,
    _lz77_encode,
    _write_prefix_code,
    decode_webp,
    decode_webp_rgb,
    encode_webp_lossless,
    webp_dimensions,
)


def _wrap(body_bits: bytes) -> bytes:
    body = bytes([_SIG]) + body_bits
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(w: _BitWriter, width: int, height: int) -> None:
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version


def _rng(seed: int) -> np.random.RandomState:
    return np.random.RandomState(seed)


# ---------------------------------------------------------------------------
# round-trips (lossless => exact)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_all_predictor_modes(mode):
    img = _rng(mode).randint(0, 256, (19, 23, 3)).astype(np.uint8)
    out = decode_webp_rgb(encode_webp_lossless(img, predictor_mode=mode))
    assert (out == img).all()


@pytest.mark.parametrize(
    "shape", [(1, 1), (1, 64), (64, 1), (2, 2), (17, 31), (40, 40)]
)
def test_roundtrip_shapes(shape):
    img = _rng(sum(shape)).randint(0, 256, (*shape, 3)).astype(np.uint8)
    blob = encode_webp_lossless(img)
    assert (decode_webp_rgb(blob) == img).all()
    assert webp_dimensions(blob) == (shape[1], shape[0])


def test_roundtrip_rgba_alpha_exact():
    img = _rng(5).randint(0, 256, (12, 14, 4)).astype(np.uint8)
    out = decode_webp(encode_webp_lossless(img))
    assert out.shape == (12, 14, 4)
    assert (out == img).all()


def test_roundtrip_flat_and_run_images_compress():
    flat = np.full((32, 32, 3), 99, np.uint8)
    blob = encode_webp_lossless(flat)
    assert (decode_webp_rgb(blob) == flat).all()
    assert len(blob) < 120  # runs + single-symbol codes actually compress
    # vertical stripes: dist=width LZ77 path
    stripes = np.tile(
        _rng(1).randint(0, 256, (1, 24, 3)).astype(np.uint8), (40, 1, 1)
    )
    blob2 = encode_webp_lossless(stripes, predictor_mode=0)
    assert (decode_webp_rgb(blob2) == stripes).all()
    assert len(blob2) < stripes.size // 2


def test_roundtrip_gradient_predictor_wins():
    yy, xx = np.mgrid[0:30, 0:30]
    img = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256], axis=2
    ).astype(np.uint8)
    sizes = {
        m: len(encode_webp_lossless(img, predictor_mode=m)) for m in (0, 12)
    }
    assert (decode_webp_rgb(encode_webp_lossless(img, predictor_mode=12)) == img).all()
    assert sizes[12] < sizes[0]  # L+T-TL predicts a bilinear ramp exactly-ish


def test_container_rejects_and_dimensions():
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_webp(b"not a webp at all")
    # lossy VP8 chunk -> NotImplementedError (codec-family contract)
    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    assert webp_dimensions(lossy) is None
    blob = encode_webp_lossless(np.zeros((7, 9, 3), np.uint8))
    assert webp_dimensions(blob) == (9, 7)


def test_truncated_stream_raises_not_hangs():
    blob = encode_webp_lossless(
        _rng(9).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    )
    with pytest.raises(ValueError):
        # keep container valid but cut the payload short
        body = blob[20 : len(blob) - 40]
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
        decode_webp(b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk)


# ---------------------------------------------------------------------------
# hand-assembled streams: decoder-only spec surface


def test_decode_color_cache():
    """literal P, cache-hit of P, literal Q — cache index computed
    independently here from the spec hash (0x1e35a7bd multiply)."""
    cache_bits = 4
    P = 0xFF112233
    idx = (0x1E35A7BD * P & 0xFFFFFFFF) >> (32 - cache_bits)
    w = _BitWriter()
    _header(w, 3, 1)
    w.write(0, 1)  # no transforms
    w.write(1, 1)  # color cache present
    w.write(cache_bits, 4)
    w.write(0, 1)  # no entropy image
    # green alphabet 256+24+16: symbols used: g(P)=0x22, 280+idx, g(Q)=7
    gl = [0] * (280 + 16)
    gl[0x22] = 1
    gl[280 + idx] = 2
    gl[7] = 2
    g_codes = _write_prefix_code(w, gl)
    rl = [0] * 256
    rl[0x11] = 1
    rl[0x44] = 1
    r_codes = _write_prefix_code(w, rl)
    bl = [0] * 256
    bl[0x33] = 1
    bl[0x55] = 1
    b_codes = _write_prefix_code(w, bl)
    al = [0] * 256
    al[0xFF] = 1
    a_codes = _write_prefix_code(w, al)
    dl = [0] * 40
    dl[0] = 1
    _write_prefix_code(w, dl)

    def emit(codes, sym):
        c, l = codes[sym]
        for i in range(l - 1, -1, -1):
            w.write((c >> i) & 1, 1)

    emit(g_codes, 0x22)  # literal P: g, r, b, a (single-sym a emits 0 bits)
    emit(r_codes, 0x11)
    emit(b_codes, 0x33)
    emit(g_codes, 280 + idx)  # cache hit -> P again
    emit(g_codes, 7)  # literal Q = ff445507? g=7? Q: a=ff r=44 g=07 b=55
    emit(r_codes, 0x44)
    emit(b_codes, 0x55)
    out = decode_webp(_wrap(w.getvalue()))
    assert out.shape == (1, 3, 4)
    # RGBA order
    assert tuple(out[0, 0]) == (0x11, 0x22, 0x33, 0xFF)
    assert tuple(out[0, 1]) == (0x11, 0x22, 0x33, 0xFF)
    assert tuple(out[0, 2]) == (0x44, 0x07, 0x55, 0xFF)


def _emit_stream(
    w: _BitWriter, pix: list[int], xsize: int, level0: bool = False
) -> None:
    """cache bit (+ meta bit for the level-0 image) + single group, via
    the module's own writer (round-trip verified above)."""
    w.write(0, 1)
    if level0:
        w.write(0, 1)  # no entropy image
    _encode_image_stream(w, pix, xsize, use_lz77=False)


def test_decode_color_indexing_bundled():
    """4-color palette => width_bits=2 (4 pixels per coded byte, 2 bits
    each). Palette is delta-coded; expected unpacking computed by hand."""
    colors = [0xFF000000, 0xFF0000FF, 0xFF00FF00, 0xFFFF0000]
    width, height = 9, 2  # 9 pixels/row -> ceil(9/4)=3 coded pixels/row
    indices = [
        [0, 1, 2, 3, 3, 2, 1, 0, 2],
        [3, 3, 3, 3, 0, 0, 0, 0, 1],
    ]
    w = _BitWriter()
    _header(w, width, height)
    w.write(1, 1)  # a transform
    w.write(3, 2)  # color indexing
    w.write(len(colors) - 1, 8)
    # palette image: 1 row of len(colors) pixels, DELTA-coded per channel
    deltas = []
    prev = 0
    for c in colors:
        d = 0
        for s in (24, 16, 8, 0):
            d |= (((c >> s) - (prev >> s)) & 0xFF) << s
        deltas.append(d)
        prev = c
    _emit_stream(w, deltas, len(colors))
    w.write(0, 1)  # end of transforms
    # coded image: pack 4 indices per green byte, low bits first
    coded_rows = []
    for row in indices:
        padded = row + [0] * (12 - len(row))
        for j in range(0, 12, 4):
            g = sum(padded[j + k] << (2 * k) for k in range(4))
            coded_rows.append(0xFF000000 | (g << 8))
    _emit_stream(w, coded_rows, 3, level0=True)
    out = decode_webp(_wrap(w.getvalue()))
    assert out.shape == (height, width, 4)
    for y in range(height):
        for x in range(width):
            c = colors[indices[y][x]]
            assert tuple(out[y, x]) == (
                (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF, (c >> 24) & 0xFF,
            )


def test_decode_color_indexing_no_bundle():
    """17+ colors => width_bits=0, plain index-in-green."""
    colors = [0xFF000000 | (i * 7 << 16 | i * 11 << 8 | i * 13) & 0xFFFFFF
              for i in range(20)]
    width = 8
    idx_row = [3, 1, 19, 0, 7, 7, 12, 5]
    w = _BitWriter()
    _header(w, width, 1)
    w.write(1, 1)
    w.write(3, 2)
    w.write(len(colors) - 1, 8)
    deltas, prev = [], 0
    for c in colors:
        d = 0
        for s in (24, 16, 8, 0):
            d |= (((c >> s) - (prev >> s)) & 0xFF) << s
        deltas.append(d)
        prev = c
    _emit_stream(w, deltas, len(colors))
    w.write(0, 1)
    _emit_stream(w, [0xFF000000 | (i << 8) for i in idx_row], width,
                 level0=True)
    out = decode_webp(_wrap(w.getvalue()))
    for x, i in enumerate(idx_row):
        c = colors[i]
        assert tuple(out[0, x]) == (
            (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF, 0xFF,
        )


def test_decode_cross_color_transform():
    """Single-block color transform; inverse deltas computed by hand with
    the spec's int8 semantics: red += (g2r*int8(g))>>5, blue += (g2b*
    int8(g))>>5 then += (r2b*int8(red'))>>5."""
    g2r, g2b, r2b = 17, -9 & 0xFF, 33  # stored bytes (int8 semantics)
    cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    stored = [0xFF204060, 0xFF807F90]  # a r g b
    w = _BitWriter()
    _header(w, 2, 1)
    w.write(1, 1)
    w.write(1, 2)  # color transform
    w.write(2, 3)  # size_bits = 4 -> one block covers the image
    _emit_stream(w, [cte], 1)
    w.write(0, 1)  # end of transforms
    _emit_stream(w, stored, 2, level0=True)
    out = decode_webp(_wrap(w.getvalue()))

    def inv(p):
        a, r, g, b = (p >> 24) & 255, (p >> 16) & 255, (p >> 8) & 255, p & 255
        s8 = lambda v: v - 256 if v >= 128 else v
        r = (r + ((s8(g2r) * s8(g)) >> 5)) & 255
        b = (b + ((s8(g2b) * s8(g)) >> 5)) & 255
        b = (b + ((s8(r2b) * s8(r)) >> 5)) & 255
        return r, g, b, a

    for x, p in enumerate(stored):
        assert tuple(out[0, x]) == inv(p)


def test_decode_meta_prefix_groups():
    """Entropy image with 2 groups along x (prefix_bits=2): group 0 codes
    only pixel A, group 1 only pixel B — decoding proves per-position
    group selection."""
    A, B = 0xFFAA1122, 0xFF335599
    width = 8  # blocks of 4 -> 2 groups
    w = _BitWriter()
    _header(w, width, 1)
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no cache
    w.write(1, 1)  # entropy image present
    w.write(0, 3)  # prefix_bits = 2
    # entropy image 2x1: meta index in (red<<8|green) -> green channel
    _emit_stream(w, [0xFF000000, 0xFF000100], 2)
    # group 0: all five codes single-symbol for A's channels
    for pix in (A, B):
        gl = [0] * 280
        gl[(pix >> 8) & 0xFF] = 1
        _write_prefix_code(w, gl)
        for chan_shift in (16, 0, 24):
            cl = [0] * 256
            cl[(pix >> chan_shift) & 0xFF] = 1
            _write_prefix_code(w, cl)
        dl = [0] * 40
        dl[0] = 1
        _write_prefix_code(w, dl)
    # every symbol is a 0-bit single-symbol code: no payload bits at all
    out = decode_webp(_wrap(w.getvalue()))
    for x in range(width):
        want = A if x < 4 else B
        assert tuple(out[0, x]) == (
            (want >> 16) & 255, (want >> 8) & 255, want & 255, 255,
        )


def test_decode_distance_map_neighbors():
    """Distance codes 1 and 2 map to (0,1)=row-above and (1,0)=previous
    pixel; build a stream using the MAPPED codes (the encoder only emits
    scalar codes, so this pins the table path)."""
    width = 4
    row0 = [0xFF010203, 0xFF040506, 0xFF070809, 0xFF0A0B0C]
    w = _BitWriter()
    _header(w, width, 2)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 1)
    # alphabet: greens of row0 + length code 256 (len=4 -> code 3)
    gl = [0] * 280
    for j, p in enumerate(row0):
        gl[(p >> 8) & 0xFF] = 2 if j < 3 else 3  # Kraft: 3/4 + 2/8 = 1
    gl[256 + 3] = 3  # length prefix code 3 -> value 4, no extra bits
    g_codes = _write_prefix_code(w, gl)
    rl = [0] * 256
    for p in row0:
        rl[(p >> 16) & 0xFF] = 2
    r_codes = _write_prefix_code(w, rl)
    bl = [0] * 256
    for p in row0:
        bl[p & 0xFF] = 2
    b_codes = _write_prefix_code(w, bl)
    al = [0] * 256
    al[0xFF] = 1
    _write_prefix_code(w, al)
    dl = [0] * 40
    dl[0] = 1  # dist prefix code 0 -> value 1 -> map (0,1) -> dist=width
    d_codes = _write_prefix_code(w, dl)

    def emit(codes, sym):
        c, l = codes[sym]
        for i in range(l - 1, -1, -1):
            w.write((c >> i) & 1, 1)

    for p in row0:
        emit(g_codes, (p >> 8) & 0xFF)
        emit(r_codes, (p >> 16) & 0xFF)
        emit(b_codes, p & 0xFF)
    emit(g_codes, 256 + 3)  # copy 4 pixels from dist map code 1 (row above)
    # d is single-symbol -> 0 bits
    out = decode_webp(_wrap(w.getvalue()))
    for x, p in enumerate(row0):
        assert tuple(out[1, x]) == tuple(out[0, x]) == (
            (p >> 16) & 255, (p >> 8) & 255, p & 255, 255,
        )


def test_lz77_value_coding_inverse():
    from dmshadoop_spark.multimodal.webp import _BitReader, _lz77_value

    for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 16, 17, 63, 64, 65, 1000, 4096,
              100000, 1048576]:
        code, extra, ebits = _lz77_encode(v)
        assert code < 40 or v > 4096  # length alphabet is 24, dist 40
        w = _BitWriter()
        w.write(extra, ebits)
        r = _BitReader(w.getvalue() or b"\x00")
        assert _lz77_value(r, code) == v


def test_overlapping_copy_run():
    """dist=1, len>1: the classic overlapping LZ77 copy (run fill)."""
    img = np.full((1, 40, 3), 0, np.uint8)
    img[0, 0] = (9, 8, 7)
    img[0, 1:] = (55, 66, 77)
    out = decode_webp_rgb(encode_webp_lossless(img, predictor_mode=0))
    assert (out == img).all()


# ---------------------------------------------------------------------------
# engine wiring


def test_decode_image_dispatch_and_sniff():
    from dmshadoop_spark.dms.extract import _sniff, extract_metadata
    from dmshadoop_spark.multimodal.binary import decode_image

    img = _rng(3).randint(0, 256, (11, 13, 3)).astype(np.uint8)
    blob = encode_webp_lossless(img)
    assert _sniff(blob) == "image/webp"
    assert (decode_image(blob) == img).all()
    meta = extract_metadata(blob)
    assert meta["content_type"] == "image/webp"
    assert (meta["width"], meta["height"]) == ("13", "11")


def test_image_features_real_for_webp():
    from dmshadoop_spark.multimodal.binary import image_features, image_stats

    img = _rng(21).randint(0, 256, (10, 12, 3)).astype(np.uint8)
    feat, real = image_features(encode_webp_lossless(img))
    assert real is True
    st = image_stats(img)
    want = (st["channel_mean"] + st["channel_std"]
            + [st["grad_x"], st["grad_y"]]
            + [c / (st["width"] * st["height"]) for c in st["hist"]])
    assert feat == [float(x) for x in want]


# ---------------------------------------------------------------------------
# animation (VP8X / ANIM / ANMF)


def test_anim_mux_demux_roundtrip():
    from dmshadoop_spark.multimodal.webp import (
        encode_webp_anim,
        webp_anim_frames,
    )

    frames = [
        _rng(i).randint(0, 256, (9, 12, 3)).astype(np.uint8) for i in range(4)
    ]
    blob = encode_webp_anim(frames, [100, 150, 200, 250])
    walked = webp_anim_frames(blob)
    assert [f["duration_ms"] for f in walked] == [100, 150, 200, 250]
    for f, src in zip(walked, frames):
        assert (f["width"], f["height"]) == (12, 9)
        assert (decode_webp_rgb(f["payload"]) == src).all()
    # still-image semantics on the whole container: first frame
    assert (decode_webp_rgb(blob) == frames[0]).all()
    assert webp_dimensions(blob) == (12, 9)
    # still webp walks to an empty frame list, not an error
    assert webp_anim_frames(encode_webp_lossless(frames[0])) == []


def test_anim_metadata_and_sniff():
    from dmshadoop_spark.dms.extract import extract_metadata
    from dmshadoop_spark.multimodal.webp import encode_webp_anim

    frames = [np.full((6, 8, 3), 30 * i, np.uint8) for i in range(3)]
    meta = extract_metadata(encode_webp_anim(frames, 120))
    assert meta["content_type"] == "image/webp"
    assert (meta["width"], meta["height"]) == ("8", "6")
    assert meta["frame_count"] == "3"
    assert meta["duration_ms"] == "360"


def test_sample_frames_real_awebp_path(spark):
    """sample_frames demuxes animated webp for real: stride follows the
    shared policy (span = last frame START), timestamps are cumulative
    ANMF durations, every emitted frame is a decodable lossless webp."""
    from dmshadoop_spark.multimodal import sample_frames
    from dmshadoop_spark.multimodal.webp import encode_webp_anim

    n, dur = 6, 150
    frames = [np.full((5, 7, 3), 40 * k % 256, np.uint8) for k in range(n)]
    blob = encode_webp_anim(frames, dur)
    df = spark.createDataFrame([("v://1", bytearray(blob))], "path string, content binary")
    rows = sample_frames(df, every_s=0.3).collect()
    span = (n - 1) * dur / 1000.0
    stride = max(1, round(n * 0.3 / span))
    want_idx = list(range(0, n, stride))
    assert [r["frame_idx"] for r in rows] == want_idx
    for r in rows:
        assert r["real"] is True
        assert abs(r["ts_sec"] - r["frame_idx"] * dur / 1000.0) < 1e-9
        assert (
            decode_webp_rgb(bytes(r["frame"])) == frames[r["frame_idx"]]
        ).all()


def test_sample_frames_still_webp_takes_stub_path(spark):
    from dmshadoop_spark.multimodal import sample_frames

    blob = encode_webp_lossless(np.zeros((4, 4, 3), np.uint8))
    df = spark.createDataFrame([("s://1", bytearray(blob))], "path string, content binary")
    rows = sample_frames(df, every_s=1.0, bytes_per_s=50).collect()
    assert rows and all(r["real"] is False for r in rows)
