"""Minimal EBML/Matroska (mkv/webm) demux — pure stdlib.

The hachoir-parity surface the reference exposed for any upload
(src/DMS.py:77-79) needs container METADATA, not media decode: duration,
timescale, per-track codec ids, video dimensions, audio rates. That is
an EBML varint walk over Segment → Info/Tracks — no codec library.

Round 5 adds the Cluster payload walk (``mkv_blocks``): SimpleBlock and
BlockGroup/Block frames with all four lacing modes (none/Xiph/fixed/
EBML) and absolute timestamps — so for codec-FREE tracks (A_PCM/INT/LIT
audio, V_UNCOMPRESSED video) the container now decodes end-to-end
(``decode_mkv_pcm``). The stub boundary is down to compressed-codec
payloads only (Vorbis/AVC/...), which would need ffmpeg-class
libraries this container doesn't ship.

Element ids and block/lacing layouts from the public Matroska/EBML RFCs
(RFC 8794 + the Matroska element registry). ``encode_mkv_skeleton``
writes the metadata-only structure; ``encode_mkv_pcm`` /
``encode_mkv_frames`` write full files with Clusters for round-trip
tests — spec-valid varints throughout.
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
CLUSTER = 0x1F43B675
CLUSTER_TIMESTAMP = 0xE7
SIMPLE_BLOCK = 0xA3
BLOCK_GROUP = 0xA0
BLOCK = 0xA1

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


def _read_size(data: bytes, i: int) -> tuple[int, int, bool]:
    """Read an element size vint → (size, next, is_unknown). RFC 8794:
    a size whose VALUE bits are all ones (0xFF, 0x7FFF, …) means
    'unknown size' — the element extends until a byte sequence that is
    not a valid child, or the parent's end. Live-muxed Matroska
    (streaming remuxers) writes Segment and Cluster this way."""
    size, j = _read_vint(data, i, keep_marker=False)
    return size, j, size == (1 << (7 * (j - i))) - 1


# Valid children of the two master elements commonly written with
# unknown size (Matroska registry): an id outside the set terminates
# the unknown-size element, per RFC 8794.
_MASTER_CHILDREN = {
    # Segment level-1: SeekHead, Info, Tracks, Cluster, Cues,
    # Attachments, Chapters, Tags, Void, CRC-32
    SEGMENT: frozenset(
        {0x114D9B74, INFO, TRACKS, 0x1F43B675, 0x1C53BB6B, 0x1941A469,
         0x1043A770, 0x1254C367, 0xEC, 0xBF}
    ),
    # Cluster: Timestamp, SimpleBlock, BlockGroup, Position, PrevSize,
    # SilentTracks, EncryptedBlock, Void, CRC-32
    0x1F43B675: frozenset(
        {0xE7, 0xA3, 0xA0, 0xA7, 0xAB, 0x5854, 0xAF, 0xEC, 0xBF}
    ),
}


def _resolve_unknown_end(data: bytes, eid: int, lo: int, hi: int) -> int:
    """Resolve an unknown-size element's end per RFC 8794: parse
    children while their ids are valid for ``eid``; the first foreign id
    (the next Cluster after an unknown-size Cluster, the next EBML
    header after an unknown-size Segment in appended live captures) or
    unparseable byte ends the element. Nested unknown-size children
    (unknown Cluster inside an unknown Segment — the standard live-mux
    layout) resolve recursively. Elements with no child registry extend
    to the parent's end. Children are header-walked twice (once here,
    once by the caller's payload walk) — vint header parsing is cheap
    next to payload handling."""
    children = _MASTER_CHILDREN.get(eid)
    if children is None:
        return hi
    i = lo
    while i < hi:
        try:
            cid, j = _read_vint(data, i, keep_marker=True)
            size, j2, unknown = _read_size(data, j)
        except ValueError:
            return i  # corrupt tail: end before it, keep parsed prefix
        if cid not in children:
            return i
        if unknown:
            i = _resolve_unknown_end(data, cid, j2, hi)
        else:
            i = min(j2 + size, hi)
    return hi


def _walk(data: bytes, lo: int, hi: int):
    """Yield (element_id, payload_lo, payload_hi) for EBML children.
    Unknown-size elements (RFC 8794) resolve via _resolve_unknown_end —
    so live-muxed files (unknown-size Segment + unknown-size Clusters,
    including several appended captures in one stream) walk correctly
    instead of being cut at a bogus 127-byte size. An unparseable
    element header ENDS the walk (best-effort demuxer posture: a
    truncated or corrupt tail — normal for live captures — preserves
    everything parsed before it; payloads with the wrong magic still
    raise at the entry points)."""
    i = lo
    while i < hi:
        try:
            eid, j = _read_vint(data, i, keep_marker=True)
            size, j2, unknown = _read_size(data, j)
        except ValueError:
            return
        if unknown:
            end = _resolve_unknown_end(data, eid, j2, hi)
        else:
            end = min(j2 + size, hi)
        yield eid, j2, end
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


# --------------------------------------------------------------------------
# Cluster payload walk (round 5): SimpleBlock/BlockGroup frames with all
# four lacing modes, per the public Matroska block-structure spec.
# --------------------------------------------------------------------------


def _read_signed_vint(data: bytes, i: int) -> tuple[int, int]:
    """EBML-lacing signed vint: unsigned vint minus (2^(7·len−1) − 1)."""
    v, j = _read_vint(data, i, keep_marker=False)
    return v - ((1 << (7 * (j - i) - 1)) - 1), j


def _block_frames(data: bytes, lo: int, hi: int) -> tuple[int, int, int, list[bytes]]:
    """Parse one (Simple)Block payload → (track, rel_ts, flags, frames).

    Layout: track-number vint, int16 BE relative timestamp, flags byte,
    then the frame data — laced per flags bits 0x06 (00 none, 01 Xiph,
    10 fixed-size, 11 EBML)."""
    track, i = _read_vint(data, lo, keep_marker=False)
    if i + 3 > hi:
        raise ValueError("EBML: truncated block header")
    rel_ts = struct.unpack(">h", data[i : i + 2])[0]
    flags = data[i + 2]
    i += 3
    lacing = (flags >> 1) & 0x3
    if lacing == 0:
        return track, rel_ts, flags, [data[i:hi]]
    count = data[i] + 1
    i += 1
    sizes: list[int] = []
    if count == 1:
        sizes = [hi - i]
    elif lacing == 2:  # fixed-size: equal frames, nothing stored
        total = hi - i
        if total % count:
            raise ValueError("EBML: fixed lacing with unequal frames")
        sizes = [total // count] * count
    elif lacing == 1:  # Xiph: 255-run-coded sizes for frames 0..n-2
        for _ in range(count - 1):
            s = 0
            while True:
                b = data[i]
                i += 1
                s += b
                if b != 255:
                    break
            sizes.append(s)
        sizes.append(hi - i - sum(sizes))
    else:  # EBML: first size a vint, then signed-vint deltas; last implied
        first, i = _read_vint(data, i, keep_marker=False)
        sizes = [first]
        for _ in range(count - 2):
            delta, i = _read_signed_vint(data, i)
            sizes.append(sizes[-1] + delta)
        sizes.append(hi - i - sum(sizes))
    frames = []
    for s in sizes:
        if s < 0 or i + s > hi:
            raise ValueError("EBML: lace size exceeds block")
        frames.append(data[i : i + s])
        i += s
    return track, rel_ts, flags, frames


def mkv_blocks(data: bytes) -> list[dict]:
    """Walk Segment → Clusters → (Simple)Blocks and return one dict per
    FRAME: {track, ts_units (cluster ts + block rel, in timescale units),
    ts_ms, keyframe, frame (bytes), block_idx (sequential per-file
    (Simple)Block counter — laced frames share it), lace_idx (position
    within the block's lace)}. Laced blocks yield one row per laced
    frame, all at the block timestamp (Matroska leaves intra-lace timing
    to the codec). Raises ValueError on malformed payloads."""
    data = bytes(data)
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML payload")
    out: list[dict] = []
    block_idx = 0
    try:
        for eid, lo, hi in _walk(data, 0, len(data)):
            if eid != SEGMENT:
                continue
            # Timescale is PER SEGMENT: reset at segment entry, stamp
            # this segment's rows once its walk completes — so a
            # late-declared Info (SeekHead-ordered files) still applies
            # to the whole segment, while concatenated multi-segment
            # streams keep each segment's own scale (round-6 review
            # finding: a single post-walk stamp leaked the LAST
            # segment's scale onto earlier segments).
            seg_start = len(out)
            timescale = 1_000_000
            for seid, slo, shi in _walk(data, lo, hi):
                if seid == INFO:
                    for ieid, ilo, ihi in _walk(data, slo, shi):
                        if ieid == TIMESTAMP_SCALE:
                            timescale = _uint(data, ilo, ihi)
                elif seid == CLUSTER:
                    cluster_ts = 0
                    for ceid, clo, chi in _walk(data, slo, shi):
                        if ceid == CLUSTER_TIMESTAMP:
                            cluster_ts = _uint(data, clo, chi)
                            continue
                        if ceid == SIMPLE_BLOCK:
                            spans = [(clo, chi, True)]
                        elif ceid == BLOCK_GROUP:
                            spans = [
                                (blo, bhi, False)
                                for beid, blo, bhi in _walk(data, clo, chi)
                                if beid == BLOCK
                            ]
                        else:
                            continue
                        for blo, bhi, is_simple in spans:
                            track, rel, flags, frames = _block_frames(
                                data, blo, bhi
                            )
                            ts = cluster_ts + rel
                            for li, fr in enumerate(frames):
                                out.append(
                                    {
                                        "track": track,
                                        "ts_units": ts,
                                        "keyframe": bool(
                                            is_simple and flags & 0x80
                                        ),
                                        "frame": fr,
                                        "block_idx": block_idx,
                                        "lace_idx": li,
                                    }
                                )
                            block_idx += 1
            for row in out[seg_start:]:
                row["ts_ms"] = row["ts_units"] * timescale / 1e6
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed EBML stream: {exc!r}") from exc
    return out


def decode_mkv_pcm(data: bytes) -> dict:
    """Full decode of an uncompressed-audio Matroska: find the
    A_PCM/INT/LIT track, concatenate its block frames in timestamp order,
    and return {samples (numpy int16, frames×channels interleaved flat),
    sample_rate, channels, n_blocks}. The one container decode that needs
    no codec library — int16 little-endian PCM per the Matroska codec
    registry. Raises ValueError if no PCM track exists."""
    import numpy as np

    meta = parse_mkv(data)
    pcm = next(
        (t for t in meta["tracks"] if t.get("codec") == "A_PCM/INT/LIT"), None
    )
    if pcm is None:
        raise ValueError("no A_PCM/INT/LIT track")
    frames = [b for b in mkv_blocks(data) if b["track"] == pcm["number"]]
    frames.sort(key=lambda b: (b["ts_units"], b["lace_idx"]))
    raw = b"".join(b["frame"] for b in frames)
    if len(raw) % 2:
        raise ValueError("PCM payload not int16-aligned")
    return {
        "samples": np.frombuffer(raw, dtype="<i2"),
        "sample_rate": int(pcm.get("sample_rate") or 0),
        "channels": int(pcm.get("channels") or 1),
        "n_blocks": len({b["block_idx"] for b in frames}),
    }


def _lace_xiph(frames: list[bytes]) -> bytes:
    out = bytearray([len(frames) - 1])
    for fr in frames[:-1]:
        n = len(fr)
        out += b"\xff" * (n // 255) + bytes([n % 255])
    return bytes(out) + b"".join(frames)


def _encode_vint(value: int, length: int) -> bytes:
    marker = 1 << (8 - length)
    return (value | (marker << (8 * (length - 1)))).to_bytes(length, "big")


def _signed_vint(v: int) -> bytes:
    for length in range(1, 9):
        bias = (1 << (7 * length - 1)) - 1
        if -bias <= v <= bias:
            return _encode_vint(v + bias, length)
    raise ValueError("signed vint out of range")


def _lace_ebml(frames: list[bytes]) -> bytes:
    out = bytearray([len(frames) - 1])
    out += _vint_size(len(frames[0]))
    prev = len(frames[0])
    for fr in frames[1:-1]:
        out += _signed_vint(len(fr) - prev)
        prev = len(fr)
    return bytes(out) + b"".join(frames)


def _simple_block(
    track: int, rel_ts: int, frames: list[bytes], lacing: str, keyframe: bool
) -> bytes:
    flag_bits = {"none": 0x00, "xiph": 0x02, "fixed": 0x04, "ebml": 0x06}
    if lacing not in flag_bits:
        raise ValueError(f"unknown lacing {lacing!r}")
    if lacing == "none" and len(frames) != 1:
        raise ValueError("lacing='none' takes exactly one frame")
    flags = flag_bits[lacing] | (0x80 if keyframe else 0)
    head = _vint_size(track) + struct.pack(">h", rel_ts) + bytes([flags])
    if lacing == "none":
        body = frames[0]
    elif lacing == "xiph":
        body = _lace_xiph(frames)
    elif lacing == "ebml":
        body = _lace_ebml(frames)
    else:
        if len({len(f) for f in frames}) != 1:
            raise ValueError("fixed lacing needs equal-size frames")
        body = bytes([len(frames) - 1]) + b"".join(frames)
    return _elem(SIMPLE_BLOCK, head + bytes(body))


def encode_mkv_pcm(
    samples,
    sample_rate: int,
    channels: int = 1,
    cluster_ms: int = 100,
    lacing: str = "none",
    frames_per_block: int = 1,
) -> bytes:
    """Deterministic full Matroska with int16-LE PCM audio Clusters: one
    Cluster per ``cluster_ms`` of audio, each holding SimpleBlocks of
    10 ms frames (``frames_per_block`` laced together per ``lacing``).
    ``decode_mkv_pcm(encode_mkv_pcm(x, r)) == x`` bit-exactly."""
    import numpy as np

    samples = np.asarray(samples, dtype="<i2").reshape(-1)
    if samples.size % channels:
        raise ValueError("sample count not divisible by channels")
    frame_samples = max(1, sample_rate // 100) * channels  # 10 ms frames
    raw = samples.tobytes()
    frame_bytes = frame_samples * 2
    frames = [
        raw[i : i + frame_bytes] for i in range(0, len(raw), frame_bytes)
    ]
    n_frames_total = len(samples) // channels
    duration_ms = n_frames_total * 1000.0 / sample_rate
    header = _elem(EBML_HEADER, _elem(DOC_TYPE, b"matroska"))
    info = _elem(
        INFO,
        _elem(TIMESTAMP_SCALE, _uint_payload(1_000_000))
        + _elem(DURATION, struct.pack(">d", duration_ms))
        + _elem(MUXING_APP, b"dmshadoop"),
    )
    track = _elem(
        TRACK_ENTRY,
        _elem(TRACK_NUMBER, _uint_payload(1))
        + _elem(TRACK_TYPE, _uint_payload(2))
        + _elem(CODEC_ID, b"A_PCM/INT/LIT")
        + _elem(
            AUDIO,
            _elem(SAMPLING_FREQUENCY, struct.pack(">d", float(sample_rate)))
            + _elem(CHANNELS, _uint_payload(channels)),
        ),
    )
    blocks_per_cluster = max(1, cluster_ms // 10)
    clusters = b""
    bi = 0
    while bi < len(frames):
        cluster_ts = bi * 10  # ms; 10 ms per frame at 1 ms timescale
        body = _elem(CLUSTER_TIMESTAMP, _uint_payload(cluster_ts))
        taken = 0
        while bi < len(frames) and taken < blocks_per_cluster:
            # un-laced blocks carry exactly one frame whatever
            # frames_per_block says; laced groups never cross a cluster
            take = (
                1
                if lacing == "none"
                else min(frames_per_block, blocks_per_cluster - taken)
            )
            group = frames[bi : bi + take]
            use = lacing if len(group) > 1 else "none"
            if use == "fixed" and len({len(f) for f in group}) != 1:
                use = "xiph"  # ragged tail can't fixed-lace
            body += _simple_block(
                1, (bi * 10) - cluster_ts, group, use, keyframe=True
            )
            bi += len(group)
            taken += len(group)
        clusters += _elem(CLUSTER, body)
    segment = _elem(SEGMENT, info + _elem(TRACKS, track) + clusters)
    return header + segment


def encode_mkv_frames(
    frames: list[bytes], fps: int, width: int, height: int
) -> bytes:
    """Deterministic full Matroska with a V_UNCOMPRESSED video track: one
    Cluster per second, one keyframe SimpleBlock per frame, 1 ms
    timescale. ``mkv_blocks`` recovers every payload bit-exactly with its
    timestamp — the real-demux branch for ``sample_frames``."""
    duration_ms = len(frames) * 1000.0 / fps
    header = _elem(EBML_HEADER, _elem(DOC_TYPE, b"matroska"))
    info = _elem(
        INFO,
        _elem(TIMESTAMP_SCALE, _uint_payload(1_000_000))
        + _elem(DURATION, struct.pack(">d", duration_ms))
        + _elem(MUXING_APP, b"dmshadoop"),
    )
    track = _elem(
        TRACK_ENTRY,
        _elem(TRACK_NUMBER, _uint_payload(1))
        + _elem(TRACK_TYPE, _uint_payload(1))
        + _elem(CODEC_ID, b"V_UNCOMPRESSED")
        + _elem(
            VIDEO,
            _elem(PIXEL_WIDTH, _uint_payload(width))
            + _elem(PIXEL_HEIGHT, _uint_payload(height)),
        ),
    )
    clusters = b""
    per_cluster = max(1, fps)
    for start in range(0, len(frames), per_cluster):
        cluster_ts = round(start * 1000 / fps)
        body = _elem(CLUSTER_TIMESTAMP, _uint_payload(cluster_ts))
        for i, fr in enumerate(frames[start : start + per_cluster]):
            rel = round((start + i) * 1000 / fps) - cluster_ts
            body += _simple_block(1, rel, [bytes(fr)], "none", keyframe=True)
        clusters += _elem(CLUSTER, body)
    segment = _elem(SEGMENT, info + _elem(TRACKS, track) + clusters)
    return header + segment
