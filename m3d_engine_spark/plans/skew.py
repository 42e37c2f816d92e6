"""Skew mitigation: salted joins, two-stage aggregations, and
exactly-once salted SELF-joins for pair generation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions; these explicit forms cover
the cases AQE cannot: a broadcast-ineligible join against a *hot key*
(one key ≫ one partition), high-cardinality aggregation states, and
the pair-generating self-joins that deliberately pin ReusedExchange
(AQE skips splitting a join whose shuffle is reused — repartitioning
one consumer would invalidate the other).

All forms are deterministic — the salt comes from hashing existing
columns, never ``rand()``, so results are reproducible and
oracle-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT_PART_COL = "_salt_part"
_SIZE_COL = "_salt_bsz"


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


def salted_self_join_streams(
    rel: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
    salt_size: int,
    salt_parts: int,
    size_col: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split ``rel`` into (cold, hot_left, hot_right) for an
    exactly-once salted SELF-join on ``key_cols`` — the pair-generation
    counterpart of ``salted_join``.

    Every banded/blocked dedup self-join in this package shares one
    straggler mode: a single join key (a shingle, an LSH bucket, a
    SimHash band slice, a deletion variant) with k rows fans its
    k·(k−1)/2 candidate pairs into ONE sort-merge-join task. AQE
    cannot split these — the plans pin ReusedExchange so the signature
    pipeline evaluates once, and AQE skips joins whose shuffle is
    reused. Rows of keys hotter than ``salt_size`` are split off: the
    LEFT copy gets a deterministic part ``pmod(xxhash64(id),
    salt_parts)``, the RIGHT copy replicates once per part, and the
    caller adds ``SALT_PART_COL`` to its equi-key. Every intra-key
    (id_a < id_b) pair still meets exactly once — in the left row's
    part — so the joined output is IDENTICAL to the unsalted join
    while the hot key's pair stream spreads over ``salt_parts`` tasks.
    Cold keys keep the original (exchange-reused) self-join; callers
    union the two match streams.

    ``size_col`` names a per-key row count already present on ``rel``
    (pass it when the caller computes one anyway — e.g. for a df
    cutoff — so the plan keeps a single window); when None the count
    is computed here as a window over ``key_cols``, reading the same
    exchange the self-join shuffles on. The size column is consumed:
    none of the returned frames carry it.
    """
    if salt_parts < 2:
        raise ValueError("salt_parts must be ≥ 2 when salt_size is set")
    reserved = {SALT_PART_COL} | ({_SIZE_COL} if size_col is None else set())
    clash = reserved & set(rel.columns)
    if clash:
        # a caller column silently clobbered by withColumn would turn
        # into corrupted pair output, not an error — refuse loudly
        raise ValueError(
            f"salted self-join reserves column name(s) {sorted(clash)}; "
            "rename the conflicting input column(s)"
        )
    if size_col is None:
        size_col = _SIZE_COL
        rel = rel.withColumn(
            size_col,
            F.count(F.lit(1)).over(Window.partitionBy(*key_cols)),
        )
    cold = rel.filter(F.col(size_col) <= salt_size).drop(size_col)
    hot = rel.filter(F.col(size_col) > salt_size).drop(size_col)
    hot_left = hot.withColumn(
        SALT_PART_COL, F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_parts))
    )
    hot_right = hot.withColumn(
        SALT_PART_COL,
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(salt_parts - 1).cast("long"))
        ),
    )
    return cold, hot_left, hot_right
