from dmshadoop_spark.multimodal.binary import (
    decode_image,
    fake_image_features,
    ingest_binary_dir,
    with_binary_features,
)

__all__ = [
    "decode_image",
    "fake_image_features",
    "ingest_binary_dir",
    "with_binary_features",
]
