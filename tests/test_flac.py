"""FLAC codec tests: lossless roundtrip across signal shapes, predictor
paths, stereo modes, bit depths, and block boundaries, plus hypothesis
property coverage and bitstream-integrity (CRC / MD5) checks.

Reference parity note: the reference read audio *metadata* only via
hachoir (src/DMS.py:77-79); this suite pins the repo's step past that —
real sample decode for the one compressed audio codec where
bit-exactness is provable (FLAC is lossless by spec, RFC 9639).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from dmshadoop_spark.multimodal import decode_flac, encode_flac
from dmshadoop_spark.multimodal.containers import parse_flac_streaminfo


def _roundtrip(x: np.ndarray, **kw) -> dict:
    blob = encode_flac(x, sample_rate=kw.pop("sample_rate", 16000), **kw)
    out = decode_flac(blob)  # verify_md5=True: STREAMINFO MD5 re-checked
    dec = out["samples"].reshape(x.shape)
    assert np.array_equal(dec, x), "FLAC roundtrip not bit-exact"
    return {"blob": blob, **out}


def _sig(name: str, n: int = 6000, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    if name == "sine":
        return (2000 * np.sin(t / 25)).astype(np.int16).reshape(-1, 1)
    if name == "noise":
        return rng.integers(-32768, 32768, (n, 1)).astype(np.int16)
    if name == "sine+noise":
        return (3000 * np.sin(t / 30) + rng.integers(-200, 200, n)).astype(
            np.int16
        ).reshape(-1, 1)
    if name == "constant":
        return np.full((n, 1), -123, np.int16)
    if name == "ramp":
        return (t % 4000 - 2000).astype(np.int16).reshape(-1, 1)
    if name == "full-scale":
        return np.tile(
            np.array([[-32768], [32767], [-32768], [0]], np.int16),
            (n // 4, 1),
        )
    raise KeyError(name)


@pytest.mark.parametrize(
    "name", ["sine", "noise", "sine+noise", "constant", "ramp", "full-scale"]
)
@pytest.mark.parametrize("predictor", ["auto", "fixed", "lpc"])
def test_mono_roundtrip(name, predictor):
    _roundtrip(_sig(name), predictor=predictor)


@pytest.mark.parametrize("stereo", ["auto", "independent", "left-side",
                                    "right-side", "mid-side"])
def test_stereo_modes_roundtrip(stereo):
    rng = np.random.default_rng(11)
    t = np.arange(5000)
    left = (2500 * np.sin(t / 21)).astype(np.int16)
    right = (left + rng.integers(-60, 60, len(t))).astype(np.int16)
    x = np.stack([left, right], axis=1)
    out = _roundtrip(x, stereo=stereo)
    assert out["channels"] == 2


def test_compression_beats_raw_on_smooth_signal():
    x = _sig("sine")
    blob = encode_flac(x, sample_rate=16000)
    assert len(blob) < x.size * 2 * 0.5  # smooth signal: >2x smaller


def test_block_boundary_sizes():
    # exact multiple, off-by-one each way, and sub-block tails
    for n in (4095, 4096, 4097, 8192, 8193, 1, 2, 3, 5):
        t = np.arange(n)
        x = (1000 * np.sin(t / 9)).astype(np.int16).reshape(-1, 1)
        out = _roundtrip(x)
        assert out["total_samples"] == n


@pytest.mark.parametrize("bits", [8, 16, 24])
def test_bit_depths(bits):
    rng = np.random.default_rng(bits)
    lim = 1 << (bits - 1)
    x = rng.integers(-lim, lim, (3000, 1)).astype(np.int32)
    blob = encode_flac(x, sample_rate=8000, bits=bits)
    out = decode_flac(blob)
    assert out["bits"] == bits
    assert np.array_equal(out["samples"].reshape(x.shape), x)


def test_streaminfo_fields_and_md5():
    x = _sig("sine+noise", n=5000)
    blob = encode_flac(x, sample_rate=44100)
    info = parse_flac_streaminfo(blob)  # the metadata-only reader agrees
    assert int(info["sample_rate"]) == 44100
    assert int(info["channels"]) == 1
    assert int(info["total_samples"]) == 5000
    out = decode_flac(blob)
    assert out["sample_rate"] == 44100
    # STREAMINFO MD5 is the MD5 of the little-endian PCM byte stream
    want = hashlib.md5(
        x.ravel().astype("<i2").tobytes()
    ).hexdigest()
    assert info["md5"] == want


def test_corrupt_stream_rejected():
    x = _sig("sine", n=2000)
    blob = bytearray(encode_flac(x, sample_rate=16000))
    blob[len(blob) // 2] ^= 0xFF  # flip a byte inside a frame
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_not_flac_rejected():
    with pytest.raises(ValueError):
        decode_flac(b"RIFF\x00\x00\x00\x00WAVE")


def test_hypothesis_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=3000),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        channels=st.sampled_from([1, 2]),
        kind=st.sampled_from(["noise", "smooth", "quiet", "steps"]),
    )
    def prop(n, seed, channels, kind):
        rng = np.random.default_rng(seed)
        if kind == "noise":
            x = rng.integers(-32768, 32768, (n, channels))
        elif kind == "smooth":
            t = np.arange(n)
            base = (2000 * np.sin(t / max(3, n // 50))).astype(np.int64)
            x = np.stack(
                [base + rng.integers(-9, 10, n) for _ in range(channels)],
                axis=1,
            )
        elif kind == "quiet":
            x = rng.integers(-2, 3, (n, channels))
        else:  # steps: long runs of constants (Rice escape / low params)
            vals = rng.integers(-30000, 30000, max(1, n // 64 + 1))
            x = np.repeat(vals, 64)[:n]
            x = np.stack([x] * channels, axis=1)
        x = np.clip(x, -32768, 32767).astype(np.int16)
        _roundtrip(x)

    prop()
