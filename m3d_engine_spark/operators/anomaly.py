"""Rolling-window anomaly detection over ordered event streams.

Beyond-reference capability — "is this event's value unusual relative
to this entity's recent history" is the standard online outlier gate
for telemetry/metrics pipelines, and the batch twin of what a
Structured Streaming job would compute with a sliding watermark.

Topology: ONE window exchange keyed on the entity (partitionBy key,
orderBy event time) carrying three bounded-frame aggregates — count,
Σx, Σx² over ROWS BETWEEN ``lookback`` PRECEDING AND 1 PRECEDING.
Everything else is projection. At 100 TB this scales exactly like any
per-entity window: the shuffle is keyed on user id (high cardinality,
well spread), per-partition state is the frame (bounded at
``lookback`` rows), and nothing is quadratic.

Engine-exact determinism: frame sums run over values scaled to
integers (``value_decimals`` fixed-point), so Σx and Σx² are exact
64-bit integers regardless of engine or evaluation order; mean/std
derive from those identical integers in identical double steps; the
z-score rounds at 4dp.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore_flags(
    events: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    lookback: int = 20,
    min_history: int = 8,
    z_cut: float = 3.0,
    value_decimals: int = 2,
    out_col: str = "z",
) -> DataFrame:
    """Adds ``out_col`` = z-score of ``value_col`` against the
    trailing ``lookback`` events of the same ``key_col`` (frame
    excludes the current row — the score is "versus history", not
    self-contaminated) and ``is_anomaly`` = |z| > ``z_cut``. Rows with
    fewer than ``min_history`` prior events get NULL z / false flag.
    NULL and NaN values score NULL / false and are excluded from every
    frame (a NaN would otherwise become 0 under the non-ANSI cast and
    silently corrupt the statistics). ``order_cols`` must be a total
    order per key (e.g. ts + event id) or the frame contents are
    nondeterministic."""
    scale = 10 ** value_decimals
    v = F.col(value_col)
    # infinities pass an isnan-only gate and would crash the long cast
    # (ANSI) or saturate to Long.Max (non-ANSI), corrupting every frame
    # that contains them — exclude them like NaN
    valid = (
        v.isNotNull() & ~F.isnan(v) & (F.abs(v) < F.lit(float("inf")))
    )
    x = F.when(valid, F.round(v * scale).cast("long"))
    # the square accumulates in decimal: long*long overflows 64 bits at
    # |v| ~ 3e7 with 2 decimals (ANSI abort / silent wraparound)
    xd = x.cast("decimal(19,0)")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-lookback, -1)
    )
    # count(x), not count(*): a NULL value must not inflate n while
    # being skipped by the sums, or the variance goes wrong.
    df = events.select(
        "*",
        F.count(x).over(w).alias("_n"),
        F.sum(x).over(w).alias("_sx"),
        F.sum(xd * xd).over(w).alias("_sxx"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double") / scale
    sxx = F.col("_sxx").cast("double") / (scale * scale)
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    mean = sx / n
    z = F.when(
        valid & (F.col("_n") >= min_history) & (var > 0),
        F.round((F.col(value_col) - mean) / F.sqrt(var), 4),
    )
    return (
        df.withColumn(out_col, z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col(out_col)) > z_cut, F.lit(False)),
        )
        .drop("_n", "_sx", "_sxx")
    )


def rolling_median(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    window_rows: int = 10,
    out_dp: int = 4,
) -> DataFrame:
    """Trailing-window median per key: the robust sibling of
    ``rolling_zscore_flags``'s mean — one outlier in the window moves
    the mean but not the median, so median-based baselines are what
    monitoring pipelines actually deploy. Appends ``rolling_median``
    over the last ``window_rows`` rows (current inclusive), with the
    standard even-count interpolation (mean of the two middle
    values).

    Implementation: Spark has no exact-percentile WINDOW function, so
    the frame's values ride a ``collect_list`` window buffer and the
    median is array arithmetic on the sorted buffer — bounded by
    ``window_rows`` (a trailing frame is small by construction; this
    is NOT the unbounded-window trap). One exchange on the key, one
    sort, one Window node.
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    keys = [F.col(c) for c in key_cols]
    order = [F.col(c).asc() for c in order_cols]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-(int(window_rows) - 1), Window.currentRow)
    )
    vc = F.col(value_col).cast("double")
    # NaN sorts LAST in array_sort and poisons the median whenever it
    # reaches the middle indices; infinities skew it the same way —
    # map both to NULL so collect_list skips them (the zscore guard)
    clean = F.when(~F.isnan(vc) & (F.abs(vc) < F.lit(float("inf"))), vc)
    buf = F.array_sort(F.collect_list(clean).over(w))
    n = F.size(buf)
    mid_hi = F.get(buf, (n / 2).cast("int"))          # 0-based upper middle
    mid_lo = F.get(buf, ((n - 1) / 2).cast("int"))    # == mid_hi when odd
    return df.withColumn(
        "rolling_median",
        F.round((mid_lo + mid_hi) / F.lit(2.0), out_dp),
    )


def ab_test(
    df: DataFrame,
    group_cols: Sequence[str],
    variant_col: str,
    metric_col: str,
    out_dp: int = 6,
) -> DataFrame:
    """Two-sample Welch t-test per group: one row per group with both
    variants' ``(n, mean)``, the mean lift, and the Welch t statistic
    — the experimentation-readout primitive (is variant B's metric
    move real or noise), computed the warehouse way: exact decimal
    sufficient statistics (n, Σx, Σx²) per (group, variant) in ONE
    map-side-combinable aggregate, then pure per-group arithmetic.
    Exactly two variants per group are required (violators return
    NULL t). Welch (unequal variances) because variant populations
    rarely match; sample variance uses n−1.
    """
    gs = list(group_cols)
    src = df.filter(
        F.col(metric_col).isNotNull() & F.col(variant_col).isNotNull()
    )
    per_variant = src.groupBy(
        *gs, F.col(variant_col).alias("_v")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(metric_col).cast("decimal(30,12)")).cast("double").alias("_sx"),
        # (38,12): 26 integer digits — a metric around 1e9 squares to
        # 1e18, which overflows (30,12)'s 18 integer digits (silent
        # NULL-drop from the sum with _n still counting, or ANSI abort)
        F.sum(
            (F.col(metric_col) * F.col(metric_col)).cast("decimal(38,12)")
        ).cast("double").alias("_sxx"),
    )
    # exactly-two-variants pivot: min/max variant per group, stats via
    # conditional aggregation — one tiny aggregate over the
    # (groups × variants)-sized relation
    agg = per_variant.groupBy(*gs).agg(
        F.count(F.lit(1)).alias("_nv"),
        F.min("_v").alias("variant_a"),
        F.max("_v").alias("variant_b"),
        F.min_by(F.struct("_n", "_sx", "_sxx"), F.col("_v")).alias("_a"),
        F.max_by(F.struct("_n", "_sx", "_sxx"), F.col("_v")).alias("_b"),
    )
    na, nb = F.col("_a._n").cast("double"), F.col("_b._n").cast("double")
    ma = F.col("_a._sx") / na
    mb = F.col("_b._sx") / nb
    va = (F.col("_a._sxx") - F.col("_a._sx") * F.col("_a._sx") / na) / (na - 1)
    vb = (F.col("_b._sxx") - F.col("_b._sx") * F.col("_b._sx") / nb) / (nb - 1)
    se2 = va / na + vb / nb
    ok = (F.col("_nv") == 2) & (na > 1) & (nb > 1)
    return agg.select(
        *gs,
        "variant_a",
        "variant_b",
        F.col("_a._n").alias("n_a"),
        F.col("_b._n").alias("n_b"),
        F.round(ma, out_dp).alias("mean_a"),
        F.round(mb, out_dp).alias("mean_b"),
        F.when(ok, F.round(mb - ma, out_dp)).alias("lift"),
        F.when(
            ok & (se2 > 0), F.round((mb - ma) / F.sqrt(se2), out_dp)
        ).alias("t_welch"),
    )
