"""Decompress .gz / .zip landing files in place.

Reference parity: algo/GzipDecompressor.scala:35-88 — driver-side thread
pool over Hadoop FS streams. Kept driver-side (matching the reference's
design point: landing dirs hold few, large files); for many-small-file
layouts flip ``distributed=True`` to run one task per file via the
binaryFiles RDD — the only RDD use in the engine, justified by
per-partition imperative I/O.
"""

from __future__ import annotations

import concurrent.futures as cf
import gzip
import io
import os
import zipfile

from pyspark.sql import DataFrame, SparkSession

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.base import Algorithm, register

# the codecs this engine actually implements; anything else in the
# landing dir fails loudly (reference: CompressionCodecFactory miss,
# GzipDecompressor.scala:66-70)
_SUFFIXES = (".gz", ".zip", ".bz2", ".xz")


def _decompress_local(path: str) -> str:
    """Decompress one local file next to itself, drop the suffix, delete
    the compressed original. Returns the output path."""
    if path.endswith(".gz"):
        out = path[: -len(".gz")]
        with gzip.open(path, "rb") as src, open(out, "wb") as dst:
            while chunk := src.read(1 << 20):
                dst.write(chunk)
    elif path.endswith(".zip"):
        out = path[: -len(".zip")]
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            if len(names) != 1:
                raise ValueError(f"{path}: zip must contain exactly one entry")
            with zf.open(names[0]) as src, open(out, "wb") as dst:
                while chunk := src.read(1 << 20):
                    dst.write(chunk)
    else:
        raise ValueError(f"{path}: not a supported compressed file {_SUFFIXES}")
    os.remove(path)
    return out


def decompress_directory(directory: str, thread_pool_size: int = 4) -> list[str]:
    """Driver-side parallel decompression (GzipDecompressor.scala:42-87)."""
    targets = [
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(_SUFFIXES)
    ]
    with cf.ThreadPoolExecutor(max_workers=thread_pool_size) as pool:
        return list(pool.map(_decompress_local, targets))


def decompress_directory_hadoop(
    spark: SparkSession, directory: str, thread_pool_size: int = 4
) -> list[str]:
    """Driver-side parallel decompression over the Hadoop FileSystem
    (GzipDecompressor.scala:42-87): listing and byte streams go through
    sources/dfs.py, so the same code handles file://, hdfs:// and
    s3a:// landing dirs — the reference's whole point. Local-path-only
    ``decompress_directory`` remains for plain-OS use."""
    from m3d_engine_spark.sources.dfs import DFS

    dfs = DFS(spark)
    if not dfs.exists(directory):
        # GzipDecompressor.scala:38-40
        raise RuntimeError(f"Directory {directory} does not exist.")
    targets = dfs.list_files(directory, recursive=False)
    for p in targets:
        if not p.endswith(_SUFFIXES):
            # The reference deliberately fails the whole job when the
            # landing dir holds a file no codec claims — an uncompressed
            # leftover means a previous half-finished run
            # (GzipDecompressor.scala:66-70)
            raise ValueError(f"No codec found for file {p}.")

    def work(path: str) -> str:
        payload = dfs.read_bytes(path)
        if path.endswith(".gz"):
            data = gzip.decompress(payload)
            out = path[: -len(".gz")]
        elif path.endswith(".bz2"):
            import bz2

            data = bz2.decompress(payload)
            out = path[: -len(".bz2")]
        elif path.endswith(".xz"):
            import lzma

            data = lzma.decompress(payload)
            out = path[: -len(".xz")]
        else:
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                names = zf.namelist()
                if len(names) != 1:
                    raise ValueError(f"{path}: zip must contain exactly one entry")
                data = zf.read(names[0])
            out = path[: -len(".zip")]
        dfs.write_bytes(out, data)
        dfs.delete(path)
        return out

    with cf.ThreadPoolExecutor(max_workers=thread_pool_size) as pool:
        return list(pool.map(work, targets))


def decompress_distributed(spark: SparkSession, directory: str) -> list[str]:
    """One Spark task per compressed file: read via binaryFiles; the
    decompressed output and the source delete go through a filesystem
    resolved from the file's OWN URI inside the task, so results land
    on the shared store (file://, hdfs://, s3://), never on executor
    local disk. Executor Python workers have no py4j gateway, so the
    JVM Hadoop FileSystem is unreachable there — pyarrow.fs is the
    in-process equivalent and ships with every PySpark executor."""
    files = spark.sparkContext.binaryFiles(directory)

    def work(item: tuple[str, bytes]) -> str:
        from pyarrow import fs as pafs

        path, payload = item
        if not path.endswith(_SUFFIXES):
            return ""
        filesystem, fspath = pafs.FileSystem.from_uri(path)
        if path.endswith(".gz"):
            data = gzip.decompress(payload)
            out = fspath[: -len(".gz")]
        else:
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                names = zf.namelist()
                if len(names) != 1:
                    raise ValueError(f"{path}: zip must contain exactly one entry")
                data = zf.read(names[0])
            out = fspath[: -len(".zip")]
        with filesystem.open_output_stream(out) as fh:
            fh.write(data)
        filesystem.delete_file(fspath)
        return path.rsplit("/", 1)[0] + "/" + out.rsplit("/", 1)[1]

    return [p for p in files.map(work).collect() if p]


@register("GzipDecompressorBytes")
class GzipDecompressor(Algorithm):
    """Config: directory (or source_dir), thread_pool_size."""

    def read(self) -> list[DataFrame]:
        return []

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        directory = self.params.get_optional("directory") or self.params.get_string("source_dir")
        threads = int(self.params.get_optional("thread_pool_size", 4))
        if self.params.get_optional("distributed", False):
            decompress_distributed(self.spark, directory)
        else:
            # Hadoop FS streams, like the reference — works on any
            # scheme the cluster can reach, not just the local disk.
            decompress_directory_hadoop(self.spark, directory, threads)
        return []

    def write(self, dfs: list[DataFrame]) -> None:
        pass
