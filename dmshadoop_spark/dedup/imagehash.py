"""Perceptual image hashing + image near-dup detection (X-family).

Training-corpus image dedup needs a fingerprint that survives re-encode,
resize, and small edits — byte hashes (X1) catch none of those. The two
classic 64-bit perceptual hashes:

  * dHash — luma → nearest-resample to 9×8 → horizontal gradient signs.
    Robust to global brightness/contrast shifts (gradients compare
    neighbors), the standard first-pass image near-dup hash.
  * aHash — luma → 8×8 → above-mean bits. Cheaper, more sensitive to
    brightness shifts; useful as a second opinion.

Integer-exact end to end: ITU-R 601 luma in integer arithmetic, our own
nearest-resample, bit packing — the same bytes hash identically on any
engine, worker, or numpy version. Candidate pairing reuses the shared
Hamming-banding construction (dedup/hamming.py): pairs within Hamming
``chunks−1`` are guaranteed caught with one uniform shuffle, no
all-pairs comparison — the same 100 TB shape as SimHash text dedup.
Decode runs through multimodal.decode_image (real PNG/JPEG/GIF codecs);
undecodable payloads drop out with a NULL hash instead of failing the
batch (the codec family's ValueError contract makes that safe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dmshadoop_spark.dedup.hamming import hamming_candidate_pairs


def _luma(arr: "np.ndarray") -> "np.ndarray":
    """Integer ITU-R 601 luma: (299R + 587G + 114B) // 1000."""
    a = arr.astype(np.int32)
    return (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000


def _resize_gray(gray: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Nearest-neighbor resample (same index rule as resize_nearest)."""
    h, w = gray.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return gray[ys][:, xs]


def _pack_bits(bits: "np.ndarray") -> int:
    """64 boolean bits (row-major) → signed 64-bit int (bit 0 first)."""
    v = 0
    for i, b in enumerate(bits.reshape(-1)[:64]):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash_int(arr: "np.ndarray", hash_size: int = 8) -> int:
    """64-bit difference hash of an HxWx3 uint8 array."""
    g = _resize_gray(_luma(arr), hash_size, hash_size + 1)
    return _pack_bits(g[:, 1:] > g[:, :-1])


def ahash_int(arr: "np.ndarray", hash_size: int = 8) -> int:
    """64-bit average hash of an HxWx3 uint8 array (above-mean bits;
    integer mean, floor — engine-portable)."""
    g = _resize_gray(_luma(arr), hash_size, hash_size)
    mean = int(g.sum()) // (hash_size * hash_size)
    return _pack_bits(g > mean)


def image_hash_df(
    images: DataFrame,
    content_col: str = "content",
    id_col: str = "path",
    method: str = "dhash",
) -> DataFrame:
    """(id, phash) for every DECODABLE payload in a binary column; rows
    whose bytes no codec accepts get NULL (filter or inspect upstream).
    Arrow-batched; the binary column never leaves its executor."""
    fn = {"dhash": dhash_int, "ahash": ahash_int}[method]

    def work(batches):
        from dmshadoop_spark.multimodal import decode_image

        for pdf in batches:
            hashes = []
            for blob in pdf[content_col]:
                if blob is None:
                    hashes.append(None)
                    continue
                try:
                    hashes.append(fn(decode_image(bytes(blob))))
                except (ValueError, NotImplementedError):
                    hashes.append(None)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "phash": pd.array(hashes, dtype="Int64")}
            )

    return images.select(id_col, content_col).mapInPandas(
        work, schema=f"{id_col} string, phash bigint"
    )


def image_neardup_pairs(
    images: DataFrame,
    content_col: str = "content",
    id_col: str = "path",
    max_hamming: int = 10,
    chunks: int = 4,
    method: str = "dhash",
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming) image near-dup candidates:
    perceptual hash → Hamming banding → exact popcount filter. Guaranteed
    complete for hamming ≤ chunks−1; raise ``chunks`` to widen the
    guarantee (more replication, same single-shuffle shape)."""
    fps = image_hash_df(images, content_col, id_col, method).filter(
        F.col("phash").isNotNull()
    )
    pairs = hamming_candidate_pairs(fps, id_col, "phash", chunks)
    return pairs.filter(F.col("hamming") <= max_hamming)
