"""Streaming ingestion & aggregation pipelines.

The reference is batch-only (SURVEY.md §2.10); these are the streaming
equivalents of its load semantics, built on Structured Streaming:

* ``streaming_append_load`` — the AppendLoad pipeline as a file stream:
  landing dir → date-partition derivation → partitioned parquet sink
  with exactly-once checkpointing. ``trigger(availableNow=True)``
  gives batch-style runs over whatever landed, the production shape for
  incremental ingestion at scale (no full-dir re-listing per run beyond
  the source's file index).
* ``windowed_rollup`` — watermarked tumbling-window aggregation over an
  event-time column (late data handled by the watermark, state bounded).
* ``streaming_dedup`` — dropDuplicatesWithinWatermark on a content
  fingerprint: the streaming variant of exact dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import StructType

from m3d_engine_spark.functions.dates import with_date_components
from m3d_engine_spark.functions.text import fingerprint


def streaming_append_load(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    target_dir: str,
    checkpoint_dir: str,
    partition_column: str,
    partition_format: str,
    target_partitions: list[str],
    file_format: str = "parquet",
) -> DataStreamWriter:
    stream = (
        spark.readStream.format(file_format)
        .schema(schema)
        .option("maxFilesPerTrigger", 1000)
        .load(source_dir)
    )
    derived = with_date_components(stream, partition_column, partition_format, target_partitions)
    return (
        derived.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(*target_partitions)
        .trigger(availableNow=True)
    )


def windowed_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window count/sum with a watermark bounding state size."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(F.col("win.start").alias("window_start"), "n_events", "sum_value")
    )


def streaming_dedup(
    docs: DataFrame, ts_col: str, text_col: str = "text", watermark: str = "1 hour"
) -> DataFrame:
    """Exact-dup suppression within the watermark horizon."""
    with_fp = docs.withColumn("fingerprint", fingerprint(F.col(text_col)))
    return with_fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
