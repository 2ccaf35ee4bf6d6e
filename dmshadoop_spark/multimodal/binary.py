"""Multimodal / binary-column plumbing (SURVEY.md §2.12 X6, §2.1 S4).

Design: image/audio/video travel as opaque BINARY columns plus typed
metadata (content_type, width/height from dms.extract). Decode and
feature-extraction run as Arrow-batched functions over ``mapInPandas`` —
the batch shape, schema, and partitioning are real and tested; the codec
call itself is stubbed because no image/audio library ships in this
container (clearly marked NotImplementedError + a deterministic fake
used by tests and the feature pipeline).

``ingest_binary_dir`` is the reference's blob-ingest path
(open().read() + create_file, src/DMS.py:106-121) as Spark's binaryFile
source — which surfaces exactly the WebHDFS FileStatus fields the
reference stored (path, modificationTime, length, content;
src/DMS.py:122,146-155).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "path string, content_type string, length bigint, feature array<float>"
)


def ingest_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw binary ingest: (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def decode_image(content: bytes) -> "np.ndarray":
    """Decode an image payload to an HxWx3 array.

    STUB: no imaging library (Pillow/opencv) is available in this
    container. The Spark-side plumbing (schema, batching, partitioning) is
    real; swap this function for a real decoder in production.
    """
    raise NotImplementedError(
        "image decoding requires Pillow/opencv, not present in this container"
    )


def fake_image_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in featurizer: sha256 → unit-norm pseudo-vector.
    Keeps the pipeline testable end-to-end with stable outputs."""
    digest = hashlib.sha256(content).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    vec = (raw.astype("float64") / 2**32) - 0.5
    norm = float(np.sqrt((vec * vec).sum())) or 1.0
    return [float(x) for x in (vec / norm)]


def _sniff_type(content: bytes) -> str:
    from dmshadoop_spark.dms.extract import _sniff

    return _sniff(content)


def with_binary_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction over a binaryFile-shaped input
    (columns: path, content). Arrow batches flow in/out; per-batch Python
    cost is amortized — the pattern a real decoder would drop into."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "content_type": content.map(lambda c: _sniff_type(bytes(c))),
                    "length": content.map(len).astype("int64"),
                    "feature": content.map(
                        lambda c: fake_image_features(bytes(c))
                    ),
                }
            )

    return binary_df.select("path", "content").mapInPandas(
        extract, schema=FEATURES_SCHEMA
    )


THUMBNAIL_SCHEMA = (
    "path string, width int, height int, thumbnail binary"
)

FRAMES_SCHEMA = (
    "path string, frame_idx int, ts_sec double, frame binary"
)


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
    row per image. Arrow batches in/out; the decode/resample call is the
    stubbed seam (fake_thumbnail ↔ Pillow's Image.resize in production) —
    schema, batching, and output sizing are the real contract."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "thumbnail": pdf["content"].map(
                        lambda c: fake_thumbnail(bytes(c), width, height)
                    ),
                }
            )

    return binary_df.select("path", "content").mapInPandas(
        work, schema=THUMBNAIL_SCHEMA
    )


def sample_frames(
    binary_df: DataFrame, every_s: float = 1.0, bytes_per_s: int = 1000
) -> DataFrame:
    """mapInPandas frame sampling over video payloads: one output row per
    sampled frame — the UDTF-shaped (1 row → N rows) multimodal pattern.

    The container demuxer is stubbed deterministically: duration :=
    length / bytes_per_s, frames at every_s intervals, each frame a
    sha256(content || idx) pseudo-payload. A real implementation swaps in
    pyav/ffmpeg keyframe extraction; partitioning, batch fan-out, and the
    (path, frame_idx, ts_sec, frame) contract stay identical."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_path, out_idx, out_ts, out_frame = [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                duration = len(raw) / bytes_per_s
                n_frames = int(duration / every_s) + 1
                for i in range(n_frames):
                    out_path.append(path)
                    out_idx.append(i)
                    out_ts.append(i * every_s)
                    out_frame.append(
                        hashlib.sha256(raw + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    "path": out_path,
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "ts_sec": pd.Series(out_ts, dtype="float64"),
                    "frame": out_frame,
                }
            )

    return binary_df.select("path", "content").mapInPandas(
        work, schema=FRAMES_SCHEMA
    )
