"""WebDataset-style tar-shard ingest (stdlib tarfile, Arrow-batched).

Large multimodal training corpora ship as directories of .tar shards
whose members are grouped by basename stem — ``000001.jpg`` +
``000001.txt`` + ``000001.json`` form one sample (the WebDataset
convention). The Spark-correct shape:

  * shards arrive as ordinary binary rows (``spark.read.format
    ("binaryFile")`` / ingest_binary_dir) — Spark's split planning
    parallelizes over shards, which is exactly how WebDataset shards are
    sized to be consumed;
  * ``explode_tar_members`` unpacks each shard WHERE IT SITS (mapInPandas
    — member bytes never shuffle) into (shard, member, ext, stem, bytes)
    rows;
  * ``group_samples`` reassembles per-sample rows with an ext→bytes map —
    the ONE shuffle in the pipeline, keyed by (shard, stem), uniform by
    construction.

Downstream, the per-extension bytes feed the real codecs (decode_image,
parse_wav, …) through the usual Arrow-batched plumbing.
"""

from __future__ import annotations

import io
import posixpath
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEMBER_SCHEMA = (
    "shard string, member string, stem string, ext string, "
    "size bigint, content binary"
)


def explode_tar_members(
    shards: DataFrame, content_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """One row per regular tar member: (shard, member, stem, ext, size,
    content). Malformed shard bytes yield zero rows rather than failing
    the task (corrupt shards surface via a count diff, the same posture
    as the codec family). Stem/ext split follows WebDataset: the stem is
    the basename up to the FIRST dot, the ext everything after it
    (``a/b.seg.json`` → stem ``b``, ext ``seg.json``)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("shard", "member", "stem", "ext", "size", "content")}
            for shard, blob in zip(pdf[path_col], pdf[content_col]):
                if blob is None:
                    continue
                try:
                    tf = tarfile.open(fileobj=io.BytesIO(bytes(blob)), mode="r:*")
                except (tarfile.TarError, EOFError, ValueError):
                    continue
                with tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        try:
                            data = tf.extractfile(m).read()
                        except (tarfile.TarError, EOFError, AttributeError):
                            continue
                        base = posixpath.basename(m.name)
                        stem, _, ext = base.partition(".")
                        out["shard"].append(shard)
                        out["member"].append(m.name)
                        out["stem"].append(stem)
                        out["ext"].append(ext)
                        out["size"].append(len(data))
                        out["content"].append(data)
            yield pd.DataFrame(out)

    return shards.select(path_col, content_col).mapInPandas(
        work, schema=MEMBER_SCHEMA
    )


def group_samples(members: DataFrame) -> DataFrame:
    """WebDataset sample reassembly: one row per (shard, stem) carrying
    parts MAP<ext, bytes> + total size. Deterministic map order (sorted
    by ext); duplicate exts within a sample keep the lexicographically
    first member name (deterministic under shuffle)."""
    per_ext = (
        members.groupBy("shard", "stem", "ext")
        .agg(
            F.min_by("content", "member").alias("content"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )
    return (
        per_ext.groupBy("shard", "stem")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("ext", "content")))
            ).alias("parts"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.sum("n_dups").alias("n_members"),
        )
    )


def write_tar_shard(samples: list[tuple[str, bytes]]) -> bytes:
    """Deterministic ustar shard from (member_name, bytes) pairs — the
    fixture generator (fixed mtime/uid/gid so bytes are reproducible)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in samples:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def explode_zip_members(
    shards: DataFrame, content_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """ZIP twin of ``explode_tar_members`` (stdlib zipfile): one row per
    regular member with the same (shard, member, stem, ext, size,
    content) schema and the same corrupt-shard zero-row posture, so
    ``group_samples`` reassembles zip shards unchanged. ZIP's central
    directory lives at the END of the archive — fine here because the
    shard arrived as one binary value; at 100 TB the parallel unit is
    the shard either way."""
    import zipfile

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in ("shard", "member", "stem", "ext", "size", "content")
            }
            for shard, blob in zip(pdf[path_col], pdf[content_col]):
                if blob is None:
                    continue
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(blob)))
                except (zipfile.BadZipFile, EOFError, ValueError):
                    continue
                with zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        try:
                            data = zf.read(info)
                        except (zipfile.BadZipFile, EOFError, ValueError):
                            continue
                        base = posixpath.basename(info.filename)
                        stem, _, ext = base.partition(".")
                        out["shard"].append(shard)
                        out["member"].append(info.filename)
                        out["stem"].append(stem)
                        out["ext"].append(ext)
                        out["size"].append(len(data))
                        out["content"].append(data)
            yield pd.DataFrame(out)

    return shards.select(path_col, content_col).mapInPandas(
        work, schema=MEMBER_SCHEMA
    )


def write_zip_shard(
    samples: list[tuple[str, bytes]], compress: bool = False
) -> bytes:
    """Deterministic ZIP shard from (member_name, bytes) pairs — fixed
    DOS timestamp (1980-01-01), no extra fields, stored or deflated."""
    import zipfile

    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for name, data in samples:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = method
            zf.writestr(info, data)
    return buf.getvalue()
