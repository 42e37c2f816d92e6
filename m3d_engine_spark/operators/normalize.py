"""Group-wise normalization (z-scores) with engine-exact determinism.

Beyond-reference capability — "how unusual is this value within its
group" is the curation filter behind outlier removal and per-stratum
quality thresholds.

The naive form (window AVG/STDDEV over doubles) is NOT portable: float
summation order differs between engines and partitionings, so the last
ulp of the mean — and therefore the rounded z-score of values near a
rounding boundary — can flip. Here the sufficient statistics are exact:
Σx and Σx² are DECIMAL sums of integer-valued inputs (exact integer
arithmetic regardless of aggregation order), and mean/std are derived
from those exact sums in one double step per group:

    var = (Σx² − (Σx)²/n) / (n − 1)        (sample variance)

Both engines then compute identical doubles from identical integers.

Topology: one map-side-combinable aggregation per group + a broadcast
join of the (tiny) per-group statistics back onto the rows — no window
over the full relation, so nothing is sorted and the group stats
relation is the only exchanged payload beyond the rows themselves.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from m3d_engine_spark.functions.idents import qident


def group_zscore(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "z",
    broadcast_stats: bool = True,
) -> DataFrame:
    """Adds ``out_col`` = round((x − mean_g) / std_g, 4); NULL for
    groups with < 2 rows or zero variance. ``value_col`` must be
    integer-valued for the exact-statistics guarantee.

    ``broadcast_stats`` forces the per-group stats to the broadcast
    side — right whenever group cardinality is bounded (languages,
    sources, shards). Pass False at extreme group cardinality (e.g.
    per-user over 10⁸ users) and the join falls back to Catalyst's
    choice — a sort-merge join co-partitioned on the group key."""
    group_cols = list(group_cols)
    x = F.col(value_col).cast("decimal(38,0)")
    stats = df.groupBy(*group_cols).agg(
        F.sum(x).alias("_sx"),
        F.sum(x * x).alias("_sxx"),
        F.count(F.lit(1)).alias("_n"),
    )
    if broadcast_stats:
        stats = F.broadcast(stats)
    joined = df.join(stats, on=group_cols)
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    mean = sx / n
    z = F.when(
        (F.col("_n") >= 2) & (var > 0),
        F.round((F.col(value_col) - mean) / F.sqrt(var), 4),
    )
    return joined.withColumn(out_col, z).drop("_sx", "_sxx", "_n")


def robust_scale(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "r",
) -> DataFrame:
    """Median/IQR scaling per group: out_col =
    round((x − median_g) / (q3_g − q1_g), 4), NULL when the IQR is
    zero. The outlier-resistant sibling of ``group_zscore`` — the
    right normalizer when quality scores have heavy tails.

    Quantiles are exact sort-interpolated (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, the contract the price_quantiles entry
    pins). Topology mirrors group_zscore: one map-side-combinable
    aggregation to a group-count-sized cuts relation, broadcast back —
    no full-relation window. At 100 TB the per-group exact sort inside
    ``percentile`` is the bound; swap in approx_percentile there and
    keep the topology."""
    group_cols = list(group_cols)
    vq = qident(value_col)
    cuts = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({vq}, 0.25)").alias("_q1"),
        F.expr(f"percentile({vq}, 0.5)").alias("_med"),
        F.expr(f"percentile({vq}, 0.75)").alias("_q3"),
    )
    joined = df.join(F.broadcast(cuts), on=group_cols)
    iqr = F.col("_q3") - F.col("_q1")
    r = F.when(
        iqr > 0,
        F.round((F.col(value_col) - F.col("_med")) / iqr, 4),
    )
    return joined.withColumn(out_col, r).drop("_q1", "_med", "_q3")


def rank_fuse(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    signals: dict[str, Column],
    weights: dict[str, float] | None = None,
    out_col: str = "blended",
) -> DataFrame:
    """Rank-fusion score blending — combine heterogeneous quality
    signals (length, diversity, model scores) on a COMMON scale by
    replacing each with its within-group percent rank, then averaging
    with ``weights`` (uniform by default). Rank fusion is the standard
    answer to "these signals have incomparable units and outliers":
    a percent rank is scale-free and outlier-immune where a z-score is
    neither.

    Determinism: each rank orders by (signal, id) — a TOTAL order, so
    percent_rank degenerates to (row_number−1)/(n−1) and is exact;
    the weighted average of exact double ranks is the same IEEE
    arithmetic in any engine. Single-member groups rank 0.0 (the
    percent_rank convention).

    Topology: all ranks share the SAME partition keys, so Catalyst
    plans ONE hash exchange on the group and stacks the per-signal
    sort+Window operators on top of it — adding a signal adds a sort,
    never a shuffle. Output = input + ``out_col`` (6dp).
    """
    if weights is None:
        weights = {k: 1.0 for k in signals}
    total_w = float(sum(weights[k] for k in signals))
    base = df.select(
        "*", *[v.alias(f"_s_{k}") for k, v in signals.items()]
    )
    blended = None
    for k in signals:
        w = Window.partitionBy(*group_cols).orderBy(
            F.col(f"_s_{k}").asc(), F.col(id_col).asc()
        )
        term = F.lit(float(weights[k]) / total_w) * F.percent_rank().over(w)
        blended = term if blended is None else blended + term
    return (
        base.withColumn(out_col, F.round(blended, 6))
        .drop(*[f"_s_{k}" for k in signals])
    )


def quantile_normalize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    grid: int = 100,
    reference: DataFrame | None = None,
) -> DataFrame:
    """Quantile normalization: map every value onto the REFERENCE
    distribution at its own within-group quantile, so all groups share
    one marginal distribution afterwards — the microarray/feature-
    harmonization standard, and in curation the fix for "domain A's
    quality scores run hot": after normalization a 90th-percentile
    score means the same thing in every group.

    Scale shape — the textbook construction (join each rank to the
    globally SORTED reference) needs a corpus-wide row_number, i.e. a
    single-partition sort. This operator replaces the sorted reference
    with its ``grid``-point exact-percentile summary (one aggregate,
    price_quantiles contract), broadcast back as a (grid+1)-array:

        q       = (rank_in_group − 0.5) / n_group      (midpoint rule)
        target  = grid[round(q · grid)]

    so the only per-row work above the within-group rank window is an
    array lookup. Rank ties break on ``id_col`` (total order);
    grid resolution is the documented approximation dial — groups
    larger than ``grid`` points map through interpolation plateaus,
    exactly like using percentile summaries anywhere else.

    ``reference`` defaults to ``df`` itself (normalize groups to the
    pooled distribution); pass a frozen relation to normalize against
    a training-time target. Returns input + (q, normalized), 4dp on q
    and 4dp on the normalized value.
    """
    grid = int(grid)
    if grid < 1:
        raise ValueError("grid must be >= 1")
    ref = df if reference is None else reference
    pcts = ", ".join(str(i / grid) for i in range(grid + 1))
    grid_rel = F.broadcast(
        ref.agg(
            F.expr(
                f"percentile({qident(value_col)}, array({pcts}))"
            ).alias("_grid")
        )
    )
    w_rank = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    w_n = Window.partitionBy(*[F.col(c) for c in group_cols])
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("_r", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_n))
    )
    q = (F.col("_r") - F.lit(0.5)) / F.col("_n")
    idx = F.round(q * grid).cast("int")
    return (
        ranked.crossJoin(grid_rel)
        .select(
            *df.columns,
            F.round(q, 4).alias("q"),
            F.round(
                F.element_at(F.col("_grid"), idx + 1), 4
            ).alias("normalized"),
        )
    )


def grouped_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    scale: int = 100,
    out_dp: int = 6,
) -> DataFrame:
    """Per-group simple linear regression ``y ≈ slope·x + intercept``
    with exact arithmetic: one row per group with ``(n, slope,
    intercept, r2)``. The per-segment trend primitive (elasticity per
    product class, drift per source, throughput per shard) that pandas
    users reach for groupby-apply-polyfit on — here it is ONE
    map-side-combinable aggregate, no Python, no per-group collect.

    ``scale`` lifts x and y onto an integer lattice (100 = exact for
    2-decimal business values); the normal-equation sums then run in
    DECIMAL(38,0) — order-independent — and only the final
    slope/intercept/r² divisions are IEEE (identical in any engine),
    rounded at ``out_dp``. NULL x or y rows are excluded; groups with
    fewer than 2 points or zero x-variance return NULL slope.
    """
    gs = [F.col(c) for c in group_cols]
    lx = F.round(F.col(x_col).cast("double") * scale).cast("decimal(38,0)")
    ly = F.round(F.col(y_col).cast("double") * scale).cast("decimal(38,0)")
    src = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*gs, lx.alias("_x"), ly.alias("_y"))
    agg = src.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_k"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    den = F.col("_k") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dny = F.col("_k") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    num = F.col("_k") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = num.cast("double") / den.cast("double")
    # intercept in original units: lattice scale cancels in slope,
    # divides out once for the intercept
    icpt = (
        (F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy"))
        .cast("double")
        / den.cast("double")
        / F.lit(float(scale))
    )
    # r² in double: num² would overflow DECIMAL(38) on big groups —
    # exact decimals cast to (identical) doubles first, then one IEEE
    # expression per group
    r2 = (num.cast("double") * num.cast("double")) / (
        den.cast("double") * dny.cast("double")
    )
    guard = (F.col("_k") >= 2) & (den.cast("double") != 0.0)
    return agg.select(
        *group_cols,
        F.col("_k").cast("long").alias("n"),
        F.when(guard, F.round(slope, out_dp)).alias("slope"),
        F.when(guard, F.round(icpt, out_dp)).alias("intercept"),
        F.when(guard & (dny.cast("double") != 0.0), F.round(r2, out_dp))
        .alias("r2"),
    )


def grid_quantile_scores(
    df: DataFrame,
    specs: dict[str, tuple[str, bool]],
    q: int = 5,
    accuracy: int = 1_000_000,
) -> DataFrame:
    """Quantile scores 1..``q`` per row WITHOUT a global sort — the
    documented 10⁹-row swap for ``ntile(q)`` windows (rfm_segments'
    scale caveat): ``specs`` maps each output column to
    ``(value_col, ascending)``; score 1 is the "best" end (smallest
    values when ascending, largest when descending — ntile's
    convention under the matching ORDER BY).

    Topology: ONE 1-row aggregate computes the q−1 boundary values for
    every spec'd column at once (``percentile_approx``, sketch memory
    bounded by ``accuracy`` — the recall/cost dial at 10⁹ rows), a
    broadcast join lands them on the rows, and assignment is a fixed
    O(q) comparison fold per row. No WindowExec, no single-partition
    sort, nothing exchanged but the 1-row threshold relation.

    Semantics vs ntile: identical when bucket boundaries fall between
    distinct values (pinned for the clean divisible case); TIED values
    always share a bucket here, where ntile splits ties across buckets
    by its ORDER BY tiebreak — by-value buckets are usually what the
    business question means ("same spend, same score"), and the
    divergence is deliberate and pinned. NULLs follow ntile's ordering
    convention explicitly: bucket 1 ascending (NULLS FIRST), bucket
    ``q`` descending (NULLS LAST) — missing data must never score as
    the best quantile of a descending metric. NaN agrees with ntile
    for free (Spark's SQL total order puts NaN above every value in
    both the sort and the ``>``/``<=`` folds). NULL rows do not count
    toward the percentile boundaries (percentile_approx skips them),
    where ntile's equal-size buckets would include them — part of the
    same by-value approximation as the tie handling.
    """
    if q < 2:
        raise ValueError("q must be >= 2")
    clash = [out for out in specs if out in df.columns]
    if clash:
        raise ValueError(
            f"grid_quantile_scores output names collide with input "
            f"columns: {clash}; pick fresh output names"
        )
    # Threshold column names must not clobber user data (the bloom_probe
    # convention): derive a prefix no existing column starts with.
    pre = "_thr"
    while any(c.startswith(pre) for c in df.columns):
        pre += "x"
    ps = [i / q for i in range(1, q)]
    p_arr = "array(" + ", ".join(repr(p) for p in ps) + ")"
    thr_cols = []
    for out, (col, asc) in specs.items():
        pl = p_arr if asc else (
            "array(" + ", ".join(repr(1 - p) for p in ps) + ")"
        )
        vq = qident(col)
        thr_cols.append(
            F.expr(
                f"percentile_approx({vq}, {pl}, {int(accuracy)})"
            ).alias(f"{pre}_{out}")
        )
    thresholds = F.broadcast(df.agg(*thr_cols))
    out_df = df.join(thresholds)
    score_cols = []
    for out, (col, asc) in specs.items():
        # ascending: threshold i is the LAST value of bucket i (rank
        # ceil(p·n)), so strictly-greater advances the bucket;
        # descending: threshold i (at percentile 1−p) is the FIRST
        # value past bucket i, so less-or-equal advances it.
        cmp_op = ">" if asc else "<="
        null_score = 1 if asc else q
        vq = qident(col)
        tq = qident(f"{pre}_{out}")
        score_cols.append(
            F.expr(
                f"CASE WHEN {vq} IS NULL THEN {null_score} "
                f"ELSE 1 + aggregate({tq}, 0, (a, t) -> "
                f"a + IF({vq} {cmp_op} t, 1, 0)) END"
            ).cast("int").alias(out)
        )
    return out_df.select(*df.columns, *score_cols)
