from dmshadoop_spark.multimodal.binary import (
    decode_image,
    fake_image_features,
    fake_thumbnail,
    ingest_binary_dir,
    resize_images,
    sample_frames,
    with_binary_features,
)

__all__ = [
    "decode_image",
    "fake_image_features",
    "fake_thumbnail",
    "ingest_binary_dir",
    "resize_images",
    "sample_frames",
    "with_binary_features",
]
