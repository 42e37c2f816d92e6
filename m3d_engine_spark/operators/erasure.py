"""Right-to-be-forgotten batch erasure over parquet lake tables.

Beyond-reference capability on the privacy surface next to
``curation.scrub_pii`` (text identifiers) and
``curation.k_anonymity_suppress`` (quasi-identifier classes): GDPR/CCPA
erasure requests arrive as a key list, and every lake table holding
rows for those keys must be rewritten WITHOUT them — atomically, so a
failed rewrite never leaves a table half-erased, and idempotently, so
re-running a request is safe.

Shape: per table, one left_anti join against the (broadcast) key list
feeds the engine's ``AtomicWriter`` temp → backup → swap protocol
(``sources/writers.py``) — the same crash-safe rewrite discipline every
load algorithm uses, here with OVERWRITE_TABLE. The keys relation is an
erasure request (thousands of rows at most), so the anti-join is a
broadcast: the table scan is the only big job and it never shuffles.

A verification pass (count remaining rows per key, expect zero) is
returned to the caller rather than asserted, because erasure jobs need
an audit artifact: write it next to the request.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m3d_engine_spark.sources.writers import AtomicWriter, LoadMode


def erase_keys(
    spark: SparkSession,
    table_location: str,
    key_col: str,
    keys: DataFrame,
    partition_columns: Sequence[str] = (),
    output_files_num: int | None = None,
) -> DataFrame:
    """Rewrite the parquet table at ``table_location`` without any row
    whose ``key_col`` appears in ``keys`` (single column, any name —
    first column is used). Returns the AUDIT relation
    ``(key, n_before, n_after)`` — ``n_after`` is computed on the
    rewritten table, so a nonzero value is a real failure, not a
    stale read.

    Atomic + idempotent: the swap happens only after the erased copy
    is fully written (backup restored on failure); erasing keys that
    are already gone is a no-op rewrite.
    """
    kc = keys.columns[0]
    key_list = F.broadcast(
        keys.select(F.col(kc).cast("string").alias("_erase_key")).distinct()
    )
    table = spark.read.parquet(table_location)
    before = (
        table.join(
            key_list,
            F.col(key_col).cast("string") == F.col("_erase_key"),
            "inner",
        )
        .groupBy(F.col("_erase_key").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_before"))
    )
    # audit must survive the rewrite of its own source
    before = spark.createDataFrame(
        before.collect(), schema="key string, n_before long"
    )
    kept = table.join(
        key_list,
        F.col(key_col).cast("string") == F.col("_erase_key"),
        "left_anti",
    )
    writer = AtomicWriter(
        spark=spark,
        target_location=table_location,
        partition_columns=list(partition_columns),
        output_files_num=output_files_num,
    )
    writer.write(kept, LoadMode.OVERWRITE_TABLE)
    after = (
        spark.read.parquet(table_location)
        .join(
            key_list,
            F.col(key_col).cast("string") == F.col("_erase_key"),
            "inner",
        )
        .groupBy(F.col("_erase_key").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    return (
        key_list.select(F.col("_erase_key").alias("key"))
        .join(before, on="key", how="left")
        .join(after, on="key", how="left")
        .select(
            "key",
            F.coalesce("n_before", F.lit(0)).alias("n_before"),
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
        )
    )
