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
