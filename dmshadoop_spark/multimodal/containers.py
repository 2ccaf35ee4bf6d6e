"""MP3 and MP4 container parsing/muxing — pure stdlib (SURVEY §2.12 X6).

The reference pulled duration/bitrate/dimension metadata out of media
files with hachoir before storing blobs (src/DMS.py:70-91). This module
is that surface rebuilt for the Spark era, and it removes the last
"mp3/mp4 stubbed" boundary from multimodal/binary.py:

  * MP3 — MPEG-1/2/2.5 Layer I/II/III frame-header walk (sync scan, the
    published bitrate/sample-rate tables, padding arithmetic, ID3v2 skip):
    frame count, per-frame sample counts → duration, average bitrate.
    Audio DECODE (MDCT synthesis) stays out of scope — metadata and frame
    boundaries are what the pipeline needs, and what the reference read.
  * MP4 — ISO BMFF box walk: mvhd (movie timescale/duration), per-track
    tkhd/hdlr/mdhd, and the full sample-table machinery (stts, stsc,
    stsz, stco/co64) resolved into absolute per-sample byte ranges — a
    REAL demux: sample payloads come back bit-exact. A deterministic
    minimal muxer (`encode_mp4`) produces spec-shaped files for
    round-trip gates, mirroring encode_wav/encode_avi.

Everything raises ValueError on malformed input so Arrow-batched callers
can fall back deterministically.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# MP3 (MPEG audio frame headers)
# ---------------------------------------------------------------------------

# Bitrate tables (kbps), index 1-14; row key = (version_group, layer).
# version_group: 1 = MPEG-1, 2 = MPEG-2/2.5 (they share tables).
_BITRATES = {
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

_SAMPLE_RATES = {  # by version bits (00=2.5, 10=2, 11=1)
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}

# samples per frame: (version_group, layer)
_SAMPLES = {(1, 1): 384, (1, 2): 1152, (1, 3): 1152,
            (2, 1): 384, (2, 2): 1152, (2, 3): 576}


def _mp3_frame_at(data: bytes, i: int):
    """Parse one frame header at offset i → (frame_len, samples, sample_rate,
    bitrate_bps) or None if not a valid header."""
    if i + 4 > len(data):
        return None
    b1, b2 = data[i], data[i + 1]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    ver_bits = (b2 >> 3) & 3
    layer_bits = (b2 >> 1) & 3
    if ver_bits == 1 or layer_bits == 0:
        return None  # reserved
    vgroup = 1 if ver_bits == 3 else 2
    layer = 4 - layer_bits  # bits 11→layer1, 10→layer2, 01→layer3
    br_idx = (data[i + 2] >> 4) & 15
    sr_idx = (data[i + 2] >> 2) & 3
    padding = (data[i + 2] >> 1) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format/bad
    bitrate = _BITRATES[(vgroup, layer)][br_idx - 1] * 1000
    sample_rate = _SAMPLE_RATES[ver_bits][sr_idx]
    samples = _SAMPLES[(vgroup, layer)]
    if layer == 1:
        frame_len = (12 * bitrate // sample_rate + padding) * 4
    else:
        frame_len = samples // 8 * bitrate // sample_rate + padding
    return frame_len, samples, sample_rate, bitrate


def mp3_frames(data: bytes) -> list[dict]:
    """Per-frame walk of an MPEG audio stream — THE single
    implementation of the ID3v2 skip, sync scan, and consistent-prefix
    walk rules (``parse_mp3`` derives from it, so the two views can't
    drift). One dict {offset, length, ts_sec, samples, sample_rate,
    bitrate} per frame; ts_sec from the cumulative sample count over
    the stream's sample rate. ``sample_frames`` uses the byte spans to
    emit actual compressed frame payloads with container-derived
    timestamps (no MDCT synthesis required). Raises ValueError if no
    coherent frame sequence exists."""
    data = bytes(data)
    i = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        # syncsafe 28-bit size after the 10-byte header
        size = (
            (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
        )
        i = 10 + size
    # sync scan (tolerate junk before the first frame, as real rippers do)
    while i < len(data) - 4 and not _mp3_frame_at(data, i):
        i += 1
    out: list[dict] = []
    total_samples = 0
    sample_rate = None
    while i + 4 <= len(data):
        parsed = _mp3_frame_at(data, i)
        if not parsed:
            break
        frame_len, samples, sr, bitrate = parsed
        if sample_rate is None:
            sample_rate = sr
        if sr != sample_rate or frame_len <= 0:
            break  # stream changed → stop at the consistent prefix
        out.append(
            {
                "offset": i,
                "length": frame_len,
                "ts_sec": total_samples / sample_rate,
                "samples": samples,
                "sample_rate": sr,
                "bitrate": bitrate,
            }
        )
        total_samples += samples
        i += frame_len
    if not out:
        raise ValueError("no MPEG audio frame found")
    return out


def _xing_offset(data: bytes, i: int) -> int:
    """Offset of the Xing/Info tag WITHIN the frame at ``i``: 4 header
    bytes + the Layer III side-info block, whose size depends on MPEG
    version and channel mode (MPEG-1: 17 mono / 32 otherwise; MPEG-2/
    2.5: 9 / 17)."""
    ver_bits = (data[i + 1] >> 3) & 3
    mono = ((data[i + 3] >> 6) & 3) == 3
    if ver_bits == 3:  # MPEG-1
        return i + 4 + (17 if mono else 32)
    return i + 4 + (9 if mono else 17)


def parse_vbr_header(data: bytes) -> dict | None:
    """Xing/Info/VBRI VBR header from the stream's FIRST frame, or None.

    Crawled audio is mostly VBR (round-10 verdict task 8): for those
    files the first frame is a metadata frame carrying the TRUE total
    frame/byte counts, and a walk over a truncated or partially
    fetched file under-reports duration without it. Layouts parsed:

      * Xing/LAME (and the CBR twin tagged ``Info``): tag at
        4 + side-info bytes into the first frame, 4 flag bytes, then
        the flag-gated fields in order — frames(4), bytes(4),
        TOC(100), quality(4) — followed by the encoder string
        (LAME's 9-byte version field sits right after quality).
      * Fraunhofer VBRI: tag at a fixed 36 bytes into the first frame;
        version(2), delay(2), quality(2), bytes(4), frames(4).

    Returns {tag, frames, bytes, quality, encoder} with None for
    fields the header does not declare. The stated ``frames`` count
    covers the AUDIO frames (the metadata frame itself is excluded —
    the ``encode_mp3_vbr`` muxer contract, matching how players derive
    duration). Returns None when the first frame carries no
    recognized header; raises ValueError only if no frame exists."""
    data = bytes(data)
    walk = mp3_frames(data)
    i = walk[0]["offset"]
    end = i + walk[0]["length"]
    bound = min(len(data), end)  # never read past the metadata frame
    p = _xing_offset(data, i)
    if p + 8 <= bound and data[p : p + 4] in (b"Xing", b"Info"):
        tag = data[p : p + 4].decode("ascii")
        flags = int.from_bytes(data[p + 4 : p + 8], "big")
        q = p + 8
        frames = nbytes = quality = None
        if flags & 0x1 and q + 4 <= bound:
            frames = int.from_bytes(data[q : q + 4], "big")
            q += 4
        if flags & 0x2 and q + 4 <= bound:
            nbytes = int.from_bytes(data[q : q + 4], "big")
            q += 4
        if flags & 0x4:
            q += 100  # TOC
        if flags & 0x8 and q + 4 <= bound:
            quality = int.from_bytes(data[q : q + 4], "big")
            q += 4
        encoder = None
        enc = data[q : min(q + 9, bound)]
        if len(enc) == 9 and all(0x20 <= c < 0x7F for c in enc):
            encoder = enc.decode("ascii").rstrip()
        return {
            "tag": tag,
            "frames": frames,
            "bytes": nbytes,
            "quality": quality,
            "encoder": encoder,
        }
    v = i + 36
    if v + 26 <= min(len(data), end) and data[v : v + 4] == b"VBRI":
        return {
            "tag": "VBRI",
            "frames": int.from_bytes(data[v + 14 : v + 18], "big"),
            "bytes": int.from_bytes(data[v + 10 : v + 14], "big"),
            "quality": int.from_bytes(data[v + 8 : v + 10], "big"),
            "encoder": None,
        }
    return None


def parse_mp3(data: bytes) -> dict:
    """Stream-level MPEG audio metadata: {n_frames, total_samples,
    duration, sample_rate, bitrate (duration-weighted average, bps)}.
    A pure aggregation over ``mp3_frames`` — frame-walk policy lives in
    exactly one place. Raises ValueError if no coherent frame sequence
    exists.

    VBR extension (round-10 verdict task 8): when the first frame
    carries a Xing/Info/VBRI header (``parse_vbr_header``), the dict
    additionally reports the STATED stream facts — {vbr_tag, encoder,
    vbr_frames, vbr_bytes, total_samples_vbr, duration_vbr} — which
    are authoritative for duration on VBR and truncated files (the
    walk only sees fetched bytes; the header states the whole file).
    Walk-derived fields keep their exact pre-round-11 values: the
    metadata frame, a spec-valid frame, stays counted in n_frames."""
    walk = mp3_frames(data)
    total_samples = sum(f["samples"] for f in walk)
    total_bits = sum(f["bitrate"] * f["samples"] for f in walk)
    sample_rate = walk[0]["sample_rate"]
    out = {
        "n_frames": len(walk),
        "total_samples": total_samples,  # exact int — float-free oracles
        "duration": total_samples / sample_rate,
        "sample_rate": sample_rate,
        "bitrate": int(round(total_bits / total_samples)),
    }
    vbr = parse_vbr_header(data)
    if vbr is not None:
        out["vbr_tag"] = vbr["tag"]
        out["encoder"] = vbr["encoder"]
        out["vbr_frames"] = vbr["frames"]
        out["vbr_bytes"] = vbr["bytes"]
        if vbr["frames"] is not None:
            spf = walk[0]["samples"]
            out["total_samples_vbr"] = vbr["frames"] * spf
            out["duration_vbr"] = vbr["frames"] * spf / sample_rate
    return out


def _fixture_payload(seed: str | None, i: int, n: int) -> bytes:
    """Deterministic per-frame payload bytes for the fixture encoders:
    zeros without a seed (the historical digest-pinned output), else a
    blake2b keystream of (seed, frame index) — distinct seeds yield
    distinct compressed essences, which the crawl-audio dedup fixtures
    need (all-zero payloads would alias every same-shape stream)."""
    import hashlib as _hl

    if seed is None:
        return b"\x00" * n
    out = b""
    j = 0
    while len(out) < n:
        out += _hl.blake2b(
            f"{seed}:{i}:{j}".encode(), digest_size=32
        ).digest()
        j += 1
    return out[:n]


def encode_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    payload_seed: str | None = None,
) -> bytes:
    """Deterministic spec-valid MPEG-1 Layer III frame sequence (headers +
    zeroed payloads, or blake2b-keystream payloads under
    ``payload_seed``) — the fixture generator for parse_mp3 round-trips.
    Real audio content is irrelevant to container parsing, exactly like
    encode_avi's opaque frame payloads."""
    br_idx = _BITRATES[(1, 3)].index(bitrate_kbps) + 1
    sr_idx = _SAMPLE_RATES[3].index(sample_rate)
    header = bytes(
        [
            0xFF,
            0xFB,  # MPEG-1 (11), Layer III (01), no CRC
            (br_idx << 4) | (sr_idx << 2),  # padding 0, private 0
            0x00,  # stereo, no mode ext/copyright/original/emphasis
        ]
    )
    frame_len = 1152 // 8 * bitrate_kbps * 1000 // sample_rate
    return b"".join(
        header + _fixture_payload(payload_seed, i, frame_len - 4)
        for i in range(n_frames)
    )


def _mp3_frame_shell(bitrate_kbps: int, sample_rate: int) -> bytearray:
    """One spec-valid zero-payload MPEG-1 Layer III stereo frame."""
    br_idx = _BITRATES[(1, 3)].index(bitrate_kbps) + 1
    sr_idx = _SAMPLE_RATES[3].index(sample_rate)
    frame_len = 1152 // 8 * bitrate_kbps * 1000 // sample_rate
    out = bytearray(frame_len)
    out[0], out[1] = 0xFF, 0xFB
    out[2] = (br_idx << 4) | (sr_idx << 2)
    return out


def encode_mp3_vbr(
    frame_bitrates: list[int],
    sample_rate: int = 44100,
    encoder: str = "LAME3.100",
    tag: str = "Xing",
) -> bytes:
    """Deterministic VBR MPEG-1 Layer III stream: a leading 128 kbps
    metadata frame carrying a Xing (or Info) header — frames flag +
    bytes flag + encoder string, LAME-style layout — followed by one
    zero-payload frame per entry of ``frame_bitrates``. The stated
    frame count covers the AUDIO frames (excludes the metadata frame);
    the stated byte count covers the WHOLE stream including it. The
    fixture generator for parse_vbr_header round-trips, mirroring
    encode_mp3."""
    frames = [_mp3_frame_shell(b, sample_rate) for b in frame_bitrates]
    head = _mp3_frame_shell(128, sample_rate)
    total = len(head) + sum(len(f) for f in frames)
    p = _xing_offset(bytes(head), 0)
    head[p : p + 4] = tag.encode("ascii")
    head[p + 4 : p + 8] = (0x3).to_bytes(4, "big")  # frames + bytes
    head[p + 8 : p + 12] = len(frames).to_bytes(4, "big")
    head[p + 12 : p + 16] = total.to_bytes(4, "big")
    enc = encoder.encode("ascii")[:9].ljust(9, b" ")
    head[p + 16 : p + 25] = enc
    return bytes(head) + b"".join(bytes(f) for f in frames)


# ---------------------------------------------------------------------------
# AAC (ADTS transport — ISO/IEC 14496-3)
# ---------------------------------------------------------------------------

# Table 1.18 sampling frequencies by sampling_frequency_index
_ADTS_RATES = [
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
]

_ADTS_PROFILES = {0: "Main", 1: "LC", 2: "SSR", 3: "LTP"}


def _adts_frame_at(data: bytes, i: int):
    """Parse one ADTS frame header at offset i → (frame_len, samples,
    sample_rate, channels, profile) or None. Disjoint from MPEG audio
    by construction: ADTS requires layer bits 00, which ``_mp3_frame_at``
    rejects as reserved, and vice versa."""
    if i + 7 > len(data):
        return None
    if data[i] != 0xFF or (data[i + 1] & 0xF6) != 0xF0:
        return None  # sync 0xFFF + layer 00
    profile = (data[i + 2] >> 6) & 3
    sf_idx = (data[i + 2] >> 2) & 0xF
    if sf_idx >= len(_ADTS_RATES):
        return None
    channels = ((data[i + 2] & 1) << 2) | ((data[i + 3] >> 6) & 3)
    frame_len = (
        ((data[i + 3] & 3) << 11) | (data[i + 4] << 3)
        | ((data[i + 5] >> 5) & 7)
    )
    header_len = 7 if (data[i + 1] & 1) else 9  # CRC adds 2 bytes
    if frame_len < header_len:
        return None
    blocks = (data[i + 6] & 3) + 1
    return frame_len, blocks * 1024, _ADTS_RATES[sf_idx], channels, profile


def adts_frames(data: bytes) -> list[dict]:
    """Per-frame walk of an AAC ADTS stream — the aac sibling of
    ``mp3_frames`` (same ID3v2-skip, sync-scan, consistent-prefix walk
    rules). One dict {offset, length, ts_sec, samples, sample_rate,
    channels, profile} per frame; each frame carries
    raw_data_blocks × 1024 samples. Raises ValueError if no coherent
    frame sequence exists. Raw AAC payload DECODE (Huffman codebooks +
    filterbank) stays behind the documented codec boundary — frame
    boundaries, timing, and stream facts are what a crawled-audio
    pipeline featurizes on, and what the reference's hachoir surface
    read (src/DMS.py:70-91)."""
    data = bytes(data)
    i = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = (
            (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
        )
        i = 10 + size
    while i < len(data) - 7 and not _adts_frame_at(data, i):
        i += 1
    out: list[dict] = []
    total_samples = 0
    sample_rate = None
    while i + 7 <= len(data):
        parsed = _adts_frame_at(data, i)
        if not parsed:
            break
        frame_len, samples, sr, channels, profile = parsed
        if sample_rate is None:
            sample_rate = sr
        if sr != sample_rate or frame_len <= 0:
            break  # stream changed → stop at the consistent prefix
        out.append(
            {
                "offset": i,
                "length": frame_len,
                "ts_sec": total_samples / sample_rate,
                "samples": samples,
                "sample_rate": sr,
                "channels": channels,
                "profile": profile,
            }
        )
        total_samples += samples
        i += frame_len
    if not out:
        raise ValueError("no ADTS frame found")
    return out


def parse_adts(data: bytes) -> dict:
    """Stream-level AAC ADTS metadata: {n_frames, total_samples,
    duration, sample_rate, channels, profile} — a pure aggregation over
    ``adts_frames``, mirroring ``parse_mp3``."""
    walk = adts_frames(data)
    total_samples = sum(f["samples"] for f in walk)
    sample_rate = walk[0]["sample_rate"]
    return {
        "n_frames": len(walk),
        "total_samples": total_samples,  # exact int — float-free oracles
        "duration": total_samples / sample_rate,
        "sample_rate": sample_rate,
        "channels": walk[0]["channels"],
        "profile": _ADTS_PROFILES[walk[0]["profile"]],
    }


def encode_adts(
    n_frames: int,
    sample_rate: int = 44100,
    channels: int = 2,
    profile: int = 1,
    payload_len: int = 20,
    payload_seed: str | None = None,
) -> bytes:
    """Deterministic spec-valid ADTS frame sequence (7-byte headers +
    zeroed payloads, or blake2b-keystream payloads under
    ``payload_seed``) — the fixture generator for parse_adts
    round-trips, mirroring encode_mp3."""
    sf_idx = _ADTS_RATES.index(sample_rate)
    frame_len = 7 + payload_len
    header = bytes(
        [
            0xFF,
            0xF1,  # MPEG-4, layer 00, protection_absent=1
            (profile << 6) | (sf_idx << 2) | ((channels >> 2) & 1),
            ((channels & 3) << 6) | (frame_len >> 11),
            (frame_len >> 3) & 0xFF,
            ((frame_len & 7) << 5) | 0x1F,  # buffer fullness hi (VBR)
            0xFC,  # fullness lo + 1 raw data block
        ]
    )
    return b"".join(
        header + _fixture_payload(payload_seed, i, payload_len)
        for i in range(n_frames)
    )


# ---------------------------------------------------------------------------
# MP4 (ISO base media file format)
# ---------------------------------------------------------------------------


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_lo, payload_hi) for each box in [start, end)."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", data[i : i + 4])
        btype = data[i + 4 : i + 8]
        lo = i + 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
            lo = i + 16
        elif size == 0:  # to end of enclosing box
            size = end - i
        if size < 8 or i + size > end:
            return
        yield btype, lo, i + size
        i += size


def _find(data: bytes, lo: int, hi: int, *path: bytes):
    """Resolve a nested box path; returns (lo, hi) payload bounds or None."""
    for name in path:
        found = None
        for btype, blo, bhi in _boxes(data, lo, hi):
            if btype == name:
                found = (blo, bhi)
                break
        if found is None:
            return None
        lo, hi = found
    return lo, hi


_MAX_TABLE_ENTRIES = 16_000_000  # sanity cap: corrupt counts would
# otherwise allocate gigabyte lists before any real parsing


def parse_mp4(data: bytes) -> dict:
    """ISO BMFF demux: movie timescale/duration plus, per track, the
    handler type, dimensions, media timescale, and the sample table
    resolved to absolute byte ranges and timestamps.

    Returns {timescale, duration, tracks: [{handler, width, height,
    timescale, samples: [(offset, size, ts_seconds), ...]}]}.
    Malformed streams raise ValueError (struct truncation included).
    """
    try:
        return _parse_mp4_inner(bytes(data))
    except struct.error as ex:
        raise ValueError(f"malformed MP4: {ex}") from ex


def _check_count(count: int, width: int, payload_len: int) -> int:
    """Validate a sample-table entry count against its payload size."""
    if count > _MAX_TABLE_ENTRIES or count * width > payload_len:
        raise ValueError(f"MP4 sample table count {count} exceeds payload")
    return count


def _parse_mp4_inner(data: bytes) -> dict:
    if _find(data, 0, len(data), b"ftyp") is None:
        raise ValueError("not an ISO BMFF payload (missing ftyp)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov box")
    out: dict = {"timescale": 0, "duration": 0.0, "tracks": []}
    mvhd = _find(data, *moov, b"mvhd")
    if mvhd:
        lo, _hi = mvhd
        version = data[lo]
        if version == 1:
            ts, dur = struct.unpack(">IQ", data[lo + 20 : lo + 32])
        else:
            ts, dur = struct.unpack(">II", data[lo + 12 : lo + 20])
        out["timescale"] = ts
        out["duration"] = dur / ts if ts else 0.0
    for btype, blo, bhi in _boxes(data, *moov):
        if btype != b"trak":
            continue
        track: dict = {"handler": "", "width": 0, "height": 0, "timescale": 0,
                       "samples": []}
        tkhd = _find(data, blo, bhi, b"tkhd")
        if tkhd:
            lo, hi = tkhd
            # width/height are 16.16 fixed point in the last 8 bytes
            w, h = struct.unpack(">II", data[hi - 8 : hi])
            track["width"], track["height"] = w >> 16, h >> 16
        mdia = _find(data, blo, bhi, b"mdia")
        if not mdia:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr:
            lo, _hi = hdlr
            track["handler"] = data[lo + 8 : lo + 12].decode("latin1")
        mdhd = _find(data, *mdia, b"mdhd")
        media_ts = 0
        if mdhd:
            lo, _hi = mdhd
            version = data[lo]
            off = lo + (20 if version == 1 else 12)
            (media_ts,) = struct.unpack(">I", data[off : off + 4])
            track["timescale"] = media_ts
        stbl = _find(data, *mdia, b"minf", b"stbl")
        if not stbl:
            out["tracks"].append(track)
            continue
        # --- sample sizes
        sizes: list[int] = []
        stsz = _find(data, *stbl, b"stsz")
        if stsz:
            lo, hi = stsz
            uniform, count = struct.unpack(">II", data[lo + 4 : lo + 12])
            if uniform:
                sizes = [uniform] * _check_count(count, 0, hi - lo)
            else:
                _check_count(count, 4, hi - lo - 12)
                sizes = list(
                    struct.unpack(f">{count}I", data[lo + 12 : lo + 12 + 4 * count])
                )
        # --- chunk offsets
        offsets: list[int] = []
        stco = _find(data, *stbl, b"stco")
        if stco:
            lo, hi = stco
            (count,) = struct.unpack(">I", data[lo + 4 : lo + 8])
            _check_count(count, 4, hi - lo - 8)
            offsets = list(
                struct.unpack(f">{count}I", data[lo + 8 : lo + 8 + 4 * count])
            )
        else:
            co64 = _find(data, *stbl, b"co64")
            if co64:
                lo, hi = co64
                (count,) = struct.unpack(">I", data[lo + 4 : lo + 8])
                _check_count(count, 8, hi - lo - 8)
                offsets = list(
                    struct.unpack(f">{count}Q", data[lo + 8 : lo + 8 + 8 * count])
                )
        # --- sample→chunk map
        stsc_entries: list[tuple[int, int]] = []  # (first_chunk, per_chunk)
        stsc = _find(data, *stbl, b"stsc")
        if stsc:
            lo, hi = stsc
            (count,) = struct.unpack(">I", data[lo + 4 : lo + 8])
            _check_count(count, 12, hi - lo - 8)
            for e in range(count):
                fc, spc, _sdi = struct.unpack(
                    ">III", data[lo + 8 + 12 * e : lo + 20 + 12 * e]
                )
                stsc_entries.append((fc, spc))
        # --- decode timestamps
        deltas: list[int] = []
        stts = _find(data, *stbl, b"stts")
        if stts:
            lo, hi = stts
            (count,) = struct.unpack(">I", data[lo + 4 : lo + 8])
            _check_count(count, 8, hi - lo - 8)
            for e in range(count):
                n, delta = struct.unpack(
                    ">II", data[lo + 8 + 8 * e : lo + 16 + 8 * e]
                )
                if len(deltas) + n > _MAX_TABLE_ENTRIES:
                    raise ValueError("MP4 stts sample count exceeds cap")
                deltas.extend([delta] * n)
        # resolve absolute (offset, size, ts) per sample
        samples: list[tuple[int, int, float]] = []
        si = 0
        t = 0
        for ci, chunk_off in enumerate(offsets):
            per_chunk = 0
            for fc, spc in stsc_entries:
                if ci + 1 >= fc:
                    per_chunk = spc
            pos = chunk_off
            for _ in range(per_chunk):
                if si >= len(sizes):
                    break
                ts_sec = (t / media_ts) if media_ts else 0.0
                samples.append((pos, sizes[si], ts_sec))
                pos += sizes[si]
                t += deltas[si] if si < len(deltas) else 0
                si += 1
        track["samples"] = samples
        out["tracks"].append(track)
    return out


def mp4_sample_payloads(data: bytes, track: dict) -> list[bytes]:
    """Materialize a parsed track's sample byte ranges."""
    return [bytes(data[o : o + s]) for o, s, _ts in track["samples"]]


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def encode_mp4(
    frames: list[bytes], fps: int, width: int = 0, height: int = 0
) -> bytes:
    """Deterministic minimal ISO BMFF mux: ftyp + mdat (concatenated
    frames) + moov with one 'vide' track whose sample table (stts/stsc/
    stsz/stco) indexes every frame — enough structure for any conforming
    demuxer (incl. parse_mp4) to recover each payload bit-exactly with
    its timestamp."""
    timescale = 1000
    delta = timescale // fps
    duration = delta * len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    data_start = len(ftyp) + 8  # mdat payload offset in the final file

    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)  # creation/modification (epoch zero)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )  # unity matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3B", 0, 0, 0, 7)  # version 0, flags: enabled|in-movie
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 16
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _box(
        b"hdlr",
        struct.pack(">B3x", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12
        + b"VideoHandler\x00",
    )
    stsd = _box(
        b"stsd",
        struct.pack(">B3xI", 0, 1)
        + _box(
            b"mp4v",
            b"\x00" * 6 + struct.pack(">H", 1)  # data ref index
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + b"\x00" * 4
            + struct.pack(">H", 1)  # frame count
            + b"\x00" * 32
            + struct.pack(">H", 24)  # depth
            + struct.pack(">h", -1),
        ),
    )
    stts = _box(
        b"stts", struct.pack(">B3xI", 0, 1) + struct.pack(">II", len(frames), delta)
    )
    stsc = _box(
        b"stsc", struct.pack(">B3xI", 0, 1) + struct.pack(">III", 1, len(frames), 1)
    )
    stsz = _box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, len(frames))
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _box(b"stco", struct.pack(">B3xI", 0, 1) + struct.pack(">I", data_start))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _box(
        b"dinf",
        _box(b"dref", struct.pack(">B3xI", 0, 1) + _box(b"url ", struct.pack(">B3B", 0, 0, 0, 1))),
    )
    vmhd = _box(b"vmhd", struct.pack(">B3B", 0, 0, 0, 1) + b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --------------------------------------------------------------------------
# ID3v2 text tags + FLAC STREAMINFO — the audio-metadata surface hachoir
# exposed (title/artist/album, duration) without any audio decode.
# --------------------------------------------------------------------------

_ID3_TEXT_FRAMES = {
    b"TIT2": "id3_title",
    b"TPE1": "id3_artist",
    b"TALB": "id3_album",
    b"TDRC": "id3_year",   # v2.4 recording time
    b"TYER": "id3_year",   # v2.3 year
    b"TCON": "id3_genre",
    b"TRCK": "id3_track",
}


def _id3_text(payload: bytes) -> str:
    """Decode one ID3v2 text frame payload: leading encoding byte then
    the string (0=latin-1, 1=UTF-16 w/BOM, 2=UTF-16BE, 3=UTF-8)."""
    if not payload:
        return ""
    enc, body = payload[0], payload[1:]
    codec = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}.get(
        enc, "latin-1"
    )
    return body.decode(codec, "replace").rstrip("\x00")


def parse_id3v2(data: bytes) -> dict[str, str]:
    """ID3v2.3/2.4 text-frame walk → {id3_title, id3_artist, ...}.
    Returns {} for payloads without a tag; never raises on malformed
    frames (skips them) — the extract_metadata contract."""
    data = bytes(data)
    if data[:3] != b"ID3" or len(data) < 10:
        return {}
    ver = data[3]
    size = (
        (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
        | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
    )
    end = min(10 + size, len(data))
    out: dict[str, str] = {}
    i = 10
    if data[5] & 0x40 and end - i >= 4:  # extended header: skip it
        ext = int.from_bytes(data[i : i + 4], "big")
        if ver == 4:  # syncsafe in v2.4
            ext = (
                (data[i] & 0x7F) << 21 | (data[i + 1] & 0x7F) << 14
                | (data[i + 2] & 0x7F) << 7 | (data[i + 3] & 0x7F)
            )
        i += max(ext, 4)
    while i + 10 <= end:
        fid = data[i : i + 4]
        if fid == b"\x00\x00\x00\x00":
            break
        raw_size = data[i + 4 : i + 8]
        if ver == 4:  # syncsafe frame sizes in v2.4
            fsize = (
                (raw_size[0] & 0x7F) << 21 | (raw_size[1] & 0x7F) << 14
                | (raw_size[2] & 0x7F) << 7 | (raw_size[3] & 0x7F)
            )
        else:
            fsize = int.from_bytes(raw_size, "big")
        if fsize <= 0 or i + 10 + fsize > end:
            break
        key = _ID3_TEXT_FRAMES.get(fid)
        if key is not None and key not in out:
            out[key] = _id3_text(data[i + 10 : i + 10 + fsize])
        i += 10 + fsize
    return out


def encode_id3v2(
    audio: bytes,
    title: str | None = None,
    artist: str | None = None,
    album: str | None = None,
) -> bytes:
    """Prepend a deterministic ID3v2.3 tag (UTF-8-capable text frames use
    latin-1 when possible, UTF-16 otherwise) to an audio payload."""
    frames = b""
    for fid, value in ((b"TIT2", title), (b"TPE1", artist), (b"TALB", album)):
        if value is None:
            continue
        try:
            payload = b"\x00" + value.encode("latin-1")
        except UnicodeEncodeError:
            payload = b"\x01" + value.encode("utf-16")
        frames += fid + len(payload).to_bytes(4, "big") + b"\x00\x00" + payload
    size = len(frames)
    header = b"ID3\x03\x00\x00" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    )
    return header + frames + audio


def parse_flac_streaminfo(data: bytes) -> dict[str, str]:
    """FLAC STREAMINFO metadata block (the mandatory first block):
    sample_rate, channels, bits_per_sample, total_samples, duration_ms —
    no audio decode. Raises ValueError on non-FLAC payloads."""
    data = bytes(data)
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    if len(data) < 4 + 4 + 34:
        raise ValueError("FLAC: truncated STREAMINFO")
    btype = data[4] & 0x7F
    if btype != 0:
        raise ValueError("FLAC: first block is not STREAMINFO")
    body = data[8:42]
    sample_rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
    channels = ((body[12] >> 1) & 0x07) + 1
    bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
    total = ((body[13] & 0x0F) << 32) | int.from_bytes(body[14:18], "big")
    out = {
        "sample_rate": str(sample_rate),
        "channels": str(channels),
        "bits_per_sample": str(bps),
        "total_samples": str(total),
    }
    if sample_rate:
        out["duration_ms"] = str(total * 1000 // sample_rate)
    md5 = body[18:34]
    if any(md5):  # all-zero = "unset" per spec (encode_flac_skeleton)
        out["md5"] = md5.hex()
    return out


def encode_flac_skeleton(
    sample_rate: int, channels: int, bits: int, total_samples: int
) -> bytes:
    """Deterministic metadata-only FLAC: magic + last-block STREAMINFO
    (zeroed min/max block/frame fields + MD5) — the structure
    parse_flac_streaminfo reads; no audio frames."""
    body = bytearray(34)
    body[10] = (sample_rate >> 12) & 0xFF
    body[11] = (sample_rate >> 4) & 0xFF
    body[12] = ((sample_rate & 0x0F) << 4) | ((channels - 1) << 1) | (
        (bits - 1) >> 4
    )
    body[13] = (((bits - 1) & 0x0F) << 4) | ((total_samples >> 32) & 0x0F)
    body[14:18] = (total_samples & 0xFFFFFFFF).to_bytes(4, "big")
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + bytes(body)
