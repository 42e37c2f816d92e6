"""Multimodal (image/audio/video) column plumbing.

Beyond-reference capability. Media ride as opaque ``binary`` payload
columns plus typed metadata; all heavy per-item work happens in
Arrow-batched ``mapInPandas`` kernels so 100 TB of blobs stream through
Python in columnar batches (never row-at-a-time pickling).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
environment, so the decode step is STUBBED: ``decode_stub=True`` swaps a
deterministic fake decoder (metadata derived from the payload bytes) for
the real one, keeping schema/partitioning/batch-shape real and tested.
Wire a real decoder by replacing ``_decode_batch_stub``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("source_uri", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),      # images/video
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),   # video/audio windows
    ]
)


def payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: byte length + content hashes. No Python."""
    p = F.col(payload_col)
    return df.withColumns(
        {
            "byte_len": F.length(p).cast("long"),
            "md5": F.md5(p),
            "sha256": F.sha2(p, 256),
        }
    )


def _decode_batch_stub(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: dimensions derived from payload bytes.

    Stands in for PIL.Image.open / av.open — same output schema, same
    batch shape, so the surrounding Spark plan is production-real.
    """
    import hashlib

    out = {
        "media_id": pdf["media_id"],
        "media_type": pdf["media_type"],
        "byte_len": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
        "sha256": pdf["payload"].map(
            lambda b: hashlib.sha256(b if b is not None else b"").hexdigest()
        ),
    }
    digests = pdf["payload"].map(
        lambda b: hashlib.md5(b if b is not None else b"").digest()
    )
    out["width"] = digests.map(lambda d: 16 + d[0] % 240).astype("int32")
    out["height"] = digests.map(lambda d: 16 + d[1] % 240).astype("int32")
    out["n_frames"] = digests.map(lambda d: 1 + d[2] % 64).astype("int32")
    return pd.DataFrame(out)


def _decode_batch_real(pdf: pd.DataFrame) -> pd.DataFrame:
    raise NotImplementedError(
        "real media decoding needs PIL/av/torchaudio, not present in this "
        "container; use decode_stub=True or replace this kernel"
    )


def decode_media(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode media payloads to typed metadata via mapInPandas.

    Arrow-batched: each Python worker receives columnar batches; at
    cluster scale prefer `spark.sql.execution.arrow.maxRecordsPerBatch`
    tuned so one batch of blobs fits comfortably in worker memory.
    """
    kernel = _decode_batch_stub if decode_stub else _decode_batch_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield kernel(pdf)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture
    (text bytes as payload) — test scaffolding for the real plumbing."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.concat(F.lit("synthetic://docs/"), F.col("doc_id")).alias("source_uri"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha", StringType()),
    ]
)


def sample_frames(
    decoded: DataFrame, every_k: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling for video payloads: one row per every-``k``-th
    frame of each decoded video.

    Division of labor is the scale-relevant part: the FAN-OUT (one row
    per sampled frame index) happens JVM-side as a
    ``sequence``+``explode`` over the decoded ``n_frames`` — no Python
    involved in multiplying rows, so a 10⁹-video corpus fans out inside
    whole-stage codegen. Only the per-frame EXTRACTION runs in the
    Arrow-batched kernel (stubbed here: a digest of the content hash
    and frame index stands in for the ffmpeg seek+decode; schema and
    batch shape are the production ones).
    """
    fanned = (
        decoded.filter(F.col("media_type") == "video")
        # A real decoder reports n_frames = 0 for corrupt/empty videos;
        # sequence(0, -1, k) is an illegal-boundaries error, so gate it.
        .filter(F.col("n_frames") > 0)
        .select(
            "media_id",
            F.col("sha256").alias("_sha"),
            F.explode(
                F.expr(f"sequence(0, n_frames - 1, {int(every_k)})")
            ).alias("_idx"),
        )
        .select(
            "media_id", "_sha", F.col("_idx").cast("int").alias("frame_idx")
        )
    )
    if not decode_stub:
        raise NotImplementedError(
            "real frame extraction needs av/ffmpeg, not present in this "
            "container; use decode_stub=True or replace the kernel"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "frame_sha": [
                        hashlib.md5(f"{s}:{i}".encode()).hexdigest()
                        for s, i in zip(pdf["_sha"], pdf["frame_idx"])
                    ],
                }
            )

    return fanned.mapInPandas(extract, schema=FRAME_SCHEMA)
