"""Skew mitigation: salted joins and two-stage aggregations.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions; these explicit forms cover
the cases AQE cannot: a broadcast-ineligible join against a *hot key*
(one key ≫ one partition), and high-cardinality aggregation states.

Both are deterministic — the salt comes from hashing existing columns,
never ``rand()``, so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(cols: Sequence[str], buckets: int) -> Column:
    """Salt in [0, buckets) from a hash of ``cols`` — stable across
    runs/retries (a rand() salt breaks task-retry determinism and any
    oracle comparison)."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    salt_source: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: the skewed side gets a
    deterministic salt, the other side is replicated ``salt_buckets``×
    (explode of a literal range — no extra scan), and the join key
    becomes (key..., salt). A hot key's rows now spread over
    ``salt_buckets`` tasks instead of one straggler.

    Use when the small side is too big to broadcast but cheap to
    replicate k×; result is identical to the unsalted join (pinned by
    test + oracle).
    """
    salt_cols = list(salt_source or skewed.columns)
    left = skewed.withColumn("__salt", deterministic_salt(salt_cols, salt_buckets))
    right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = left.join(right, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def two_stage_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage (salted) aggregation for decomposable aggregates:
    stage 1 groups by (keys..., salt) — hot keys split across tasks —
    stage 2 re-aggregates partials by keys alone.

    ``aggs`` maps output name → (input column, fn) with fn in
    {sum, count, min, max}. Note Spark's hash aggregate already does
    map-side partial aggregation; explicit salting matters when the
    *reduce-side per-key state* is the bottleneck (e.g. a hot key whose
    partial results still overwhelm one task, or when feeding a window
    function that cannot partial-aggregate).
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    for _, (c, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{fn!r} is not decomposable here; use sum/count/min/max")
    salted = df.withColumn("__salt", deterministic_salt(list(keys), salt_buckets))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[first_fn[fn](c).alias(name) for name, (c, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fn[fn](name).alias(name) for name, (c, fn) in aggs.items()]
    )
