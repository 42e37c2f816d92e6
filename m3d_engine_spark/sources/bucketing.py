"""Bucketed tables: shuffle-free co-located joins.

For repeatedly-joined large tables, bucketing both sides on the join
key at write time removes the per-query shuffle entirely: Spark reads
matching buckets pairwise and sort-merge-joins them in place. At 100 TB
this converts every fact⋈fact join on the bucket key from a full
two-sided exchange into a scan — the single largest recurring saving a
layout decision can buy. (One-off joins don't amortize the bucketed
write; AQE/broadcast handle those.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """saveAsTable with bucketBy(+sortBy): downstream equi-joins and
    aggregations on ``bucket_cols`` skip their Exchange when both sides
    share the bucketing (pinned by tests/test_plans.py)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
