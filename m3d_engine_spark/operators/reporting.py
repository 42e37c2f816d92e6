"""Corpus reporting: grouped cardinality statistics with a sketch tier.

Beyond-reference capability. Dataset cards and curation dashboards need
"rows and distinct X per group" over the full corpus. Exact
count_distinct plans as an Expand + two exchanges carrying every
distinct (group, value) pair — at 10⁹ rows that IS the job. The scale
tier is ``approx_count_distinct`` (HyperLogLog++): a fixed-size sketch
per (task, group) merged map-side, so the exchange carries one sketch
per group per task regardless of value cardinality.

Both tiers share one topology (groupBy → agg); ``exact=True`` is the
oracle-checkable twin the tests compare the sketch against (relative
error ≤ ~2·rsd pinned in tests/test_curation_chunking.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_distinct_report(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rsd: float = 0.01,
    exact: bool = False,
) -> DataFrame:
    """Per group: ``n_rows`` and ``n_distinct`` of ``value_col``.

    ``exact=False`` (default) uses the HLL++ sketch with relative
    standard deviation ``rsd`` — the 100 TB tier; ``exact=True`` uses
    count_distinct — the correctness twin. Same columns either way, so
    callers can dial precision without touching downstream code.
    """
    n_distinct = (
        F.count_distinct(F.col(value_col))
        if exact
        else F.approx_count_distinct(value_col, rsd)
    )
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        n_distinct.cast("long").alias("n_distinct"),
    )


def group_top_terms(
    docs: DataFrame,
    group_cols: Sequence[str],
    text_col: str,
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Per-group heavy hitters: the ``k`` most frequent tokens of each
    group with their counts — the "what does each slice talk about"
    dashboard primitive (and the exact tier a count-min-sketch variant
    would be checked against).

    Topology: explode → ONE map-side-combinable count aggregation keyed
    on (group, term) → WindowGroupLimit keeps k rows per group per task
    before the final exchange. The aggregation exchange carries
    vocabulary-sized rows per group, never corpus-sized; nothing
    quadratic. Returns (group_cols…, term, cnt, rk); ties break on term
    ASC for a total, engine-stable order."""
    from m3d_engine_spark.functions.text import tokens
    from pyspark.sql import Window

    group_cols = list(group_cols)
    counts = (
        docs.select(*group_cols, F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(*group_cols, "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("cnt").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .withColumn("rk", F.col("rk").cast("int"))
    )
