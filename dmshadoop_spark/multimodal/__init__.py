from dmshadoop_spark.multimodal.binary import (
    decode_image,
    decode_png,
    encode_exif_jpeg,
    encode_png,
    fake_image_features,
    fake_thumbnail,
    ingest_binary_dir,
    resize_images,
    resize_nearest,
    sample_frames,
    with_binary_features,
)

__all__ = [
    "decode_image",
    "decode_png",
    "encode_exif_jpeg",
    "encode_png",
    "fake_image_features",
    "fake_thumbnail",
    "ingest_binary_dir",
    "resize_images",
    "resize_nearest",
    "sample_frames",
    "with_binary_features",
]
