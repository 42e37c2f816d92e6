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

from pyspark.sql import DataFrame, Window
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


def profile_table(
    df: DataFrame,
    cols: Sequence[str],
    exact: bool = False,
    rsd: float = 0.01,
) -> DataFrame:
    """Deequ-style per-column profile in ONE pass over the data:
    (column, n_rows, n_nulls, n_distinct, min_value, max_value) — the
    dataset-card / data-quality summary a pipeline records next to
    every write.

    Topology: a single global aggregate computes every metric for every
    column at once (partial/final HashAggregate — one exchange carrying
    ONE row per task), then a ``stack`` unpivot reshapes the 1-row
    result to long form. The reshape runs on one row, so profiling k
    columns costs exactly one scan and one 1-row exchange regardless of
    k or corpus size — never k passes.

    ``exact=False`` (default) uses HLL++ ``approx_count_distinct`` for
    the distinct counts — fixed-size sketch buffers, the 100 TB tier;
    ``exact=True`` is the oracle-checkable twin (count_distinct plans an
    Expand but over a 1-row final aggregate it stays cheap at test sf).
    min/max are cast to string so heterogeneous column types share one
    report schema; null-only columns report NULL min/max.
    """
    cols = list(cols)
    # Internal aliases are POSITIONAL (_nn_0, …), never derived from the
    # user's column names — a name with dots/quotes/spaces must not be
    # able to break the stack() SQL below; the visible label is escaped.
    aggs = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for i, c in enumerate(cols):
        col = df[c]  # df[...] resolves literal names (dots included)
        nd = (
            F.count_distinct(col)
            if exact
            else F.approx_count_distinct(col, rsd)
        )
        aggs += [
            (F.count(F.lit(1)) - F.count(col)).cast("long").alias(f"_nn_{i}"),
            nd.cast("long").alias(f"_nd_{i}"),
            F.min(col).cast("string").alias(f"_mn_{i}"),
            F.max(col).cast("string").alias(f"_mx_{i}"),
        ]
    one = df.agg(*aggs)
    stacked = ", ".join(
        "'{label}', _nn_{i}, _nd_{i}, _mn_{i}, _mx_{i}".format(
            label=c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def numeric_histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equal-width histogram of ``value_col``: (bin, lo_edge, hi_edge,
    n) with ``bins`` buckets over [lo, hi] (defaults to the observed
    min/max — ONE extra aggregate, broadcast back as a 1-row relation,
    same shape as the quantizer bounds). The top edge is inclusive
    (x == hi lands in the last bin); out-of-range values clamp into the
    end bins, so provided [lo, hi] windows never drop rows silently.

    Topology: bin assignment is a projection; the count is one
    map-side-combinable aggregate keyed on the bin id — the exchange
    carries ≤ ``bins`` rows per task at any corpus size. NULL values
    are excluded (they have no bin; count them via ``profile_table``).
    """
    bins = int(bins)
    if bins <= 0:
        raise ValueError("bins must be positive")
    data = df.select(F.col(value_col).cast("double").alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    if lo is None or hi is None:
        bounds = F.broadcast(
            data.agg(F.min("_x").alias("_lo"), F.max("_x").alias("_hi"))
        )
        staged = data.crossJoin(bounds)
    else:
        staged = data.withColumn("_lo", F.lit(float(lo))).withColumn(
            "_hi", F.lit(float(hi))
        )
    bin_expr = F.when(F.col("_hi") <= F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.greatest(
                F.floor(
                    (F.col("_x") - F.col("_lo"))
                    * F.lit(float(bins))
                    / (F.col("_hi") - F.col("_lo"))
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(bins - 1),
        )
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    return (
        staged.withColumn("bin", bin_expr)
        .groupBy("bin")
        .agg(
            F.round(F.first(F.col("_lo") + F.col("bin") * width), 4).alias(
                "lo_edge"
            ),
            F.round(
                F.first(F.col("_lo") + (F.col("bin") + 1) * width), 4
            ).alias("hi_edge"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
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


def benford_audit(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """First-significant-digit census vs Benford's law — the standard
    fabricated-/synthetic-numbers screen for a numeric column (amounts,
    populations, file sizes): naturally-occurring multi-magnitude data
    follows P(d) = log10(1 + 1/d); manufactured data rarely does.

    Emits one row per (group, digit 1-9): the count, observed
    fraction, Benford expectation, and the digit's chi-square
    contribution n·(obs−exp)²/exp — Σ over digits vs the χ²(8)
    critical value is the audit. Rows with NULL/zero values are
    excluded (they have no first significant digit).

    Determinism: the first digit comes from the STRING form of |value|
    (regexp for the first 1-9), not from log/pow float arithmetic —
    any faithful decimal rendering of the same value (plain or
    scientific, either engine) starts with its first significant
    digit, so bucketing is bit-exact across engines and safe at any
    magnitude (a fixed-precision decimal cast would overflow ~1e26);
    fractions and chi-square round to 6dp after exact-integer counts.
    Topology:
    one projection + one (group, digit)-keyed aggregate; per-group
    totals reuse the 9-row-per-group aggregate via a tiny window —
    the column is scanned once, nothing exchanges but digit counts.
    """
    import math

    gc = [F.col(c) for c in group_cols]
    digit = F.regexp_extract(
        F.abs(F.col(value_col)).cast("string"), "[1-9]", 0
    )
    counted = (
        df.filter(F.col(value_col).isNotNull())
        .select(*gc, digit.alias("digit"))
        .filter(F.col("digit") != "")
        .groupBy(*gc, "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    w_tot = Window.partitionBy(*gc) if gc else Window.partitionBy(F.lit(1))
    expected = F.element_at(
        F.array(*[
            F.lit(round(math.log10(1.0 + 1.0 / d), 6)) for d in range(1, 10)
        ]),
        F.col("digit").cast("int"),
    )
    tot = F.sum("n").over(w_tot)
    obs = F.col("n") / tot
    return counted.select(
        *gc,
        F.col("digit").cast("int").alias("digit"),
        "n",
        F.round(obs, 6).alias("obs_frac"),
        expected.alias("benford_frac"),
        F.round(
            tot * (obs - expected) * (obs - expected) / expected, 6
        ).alias("chi2_part"),
    )


def join_skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top: int = 20,
) -> DataFrame:
    """Pre-join skew diagnostic — the "will this key melt a reducer"
    check run BEFORE shipping a 100 TB join: per join-key row counts
    reduced to the ``top`` heaviest keys, each with its share of the
    relation and the running cumulative share. A top-1 share over a
    few percent says salt this key (plans/skew.salted_join) or switch
    on AQE skew handling and check the plan; a long flat tail says
    the hash partitioner is fine.

    Topology: ONE map-side-combinable count aggregate on the key
    (exactly the exchange the real join would pay, so the report costs
    what one build-side pass costs); the top-k runs as
    TakeOrderedAndProject (per-task top-k, no global sort) and the
    shares/cumulative window run over the top-k relation only.
    Returns (key..., n, share, cum_share) ordered by n DESC, 6dp,
    deterministic tie-break on the key columns.
    """
    from pyspark.sql import Window

    gc = [F.col(c) for c in key_cols]
    counted = df.groupBy(*gc).agg(F.count(F.lit(1)).alias("n"))
    total = F.broadcast(
        counted.agg(F.sum("n").cast("double").alias("_tot"))
    )
    order = [F.col("n").desc()] + [F.col(c).asc() for c in key_cols]
    topk = counted.orderBy(*order).limit(int(top))
    w_cum = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        topk.crossJoin(total)
        .select(
            *[F.col(c) for c in key_cols],
            "n",
            F.round(F.col("n") / F.col("_tot"), 6).alias("share"),
            F.round(
                F.sum("n").over(w_cum) / F.col("_tot"), 6
            ).alias("cum_share"),
        )
    )


def fk_audit(
    child: DataFrame,
    parent: DataFrame,
    fk_cols: Sequence[str],
    pk_cols: Sequence[str],
) -> DataFrame:
    """Referential-integrity audit for a child→parent relationship:
    one row with total child rows, rows with NULL foreign keys, orphan
    rows (non-null FK with no matching parent), and the orphan rate —
    the join-before-the-join sanity gate that catches a bad ingest
    before it silently drops (inner join) or null-pads (left join)
    downstream.

    Topology: NULL census is a map-side aggregate; orphans are ONE
    left-anti join on the key (the cheapest possible containment
    check — no row multiplication, parent side reduced to distinct
    keys) followed by a count. Returns
    (n_rows, n_null_fk, n_orphans, orphan_rate), exact longs + one
    6dp division.
    """
    fk = [F.col(c) for c in fk_cols]
    null_pred = fk[0].isNull()
    for c in fk[1:]:
        null_pred = null_pred | c.isNull()
    keys = parent.select(
        *[F.col(p).alias(f) for p, f in zip(pk_cols, fk_cols)]
    ).distinct()
    non_null = child.filter(~null_pred)
    orphans = non_null.join(keys, on=list(fk_cols), how="left_anti")
    base = F.broadcast(
        child.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(null_pred.cast("long")).alias("n_null_fk"),
        )
    )
    return (
        orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        .crossJoin(base)
        .select(
            "n_rows",
            F.coalesce(F.col("n_null_fk"), F.lit(0).cast("long")).alias(
                "n_null_fk"
            ),
            "n_orphans",
            F.round(F.col("n_orphans") / F.col("n_rows"), 6).alias(
                "orphan_rate"
            ),
        )
    )


def psi_drift(
    expected: DataFrame,
    actual: DataFrame,
    value_col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard "did this feature's distribution move"
    monitor (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted):

        PSI = Σ_bins (p_actual − p_expected) · ln(p_actual / p_expected)

    Bin edges are ``bins`` equal-width cuts over [lo, hi] (pass the
    training-time bounds for a production monitor; defaults to the
    EXPECTED side's exact min/max — never the actual side, which would
    let drift move its own goalposts). Out-of-range values clamp into
    the edge bins; both fractions are Laplace-smoothed by half a count
    so an empty bin cannot produce ±inf.

    Determinism: bin assignment is floor on a single IEEE expression
    of exact counts/bounds; fractions are exact-integer counts over
    totals; one ln per bin, 6dp. Topology: one bin-keyed aggregate
    per side (map-side combinable), a bins-sized full-outer join, a
    broadcast 1-row totals relation. Returns one row per bin
    (bin, n_expected, n_actual, p_expected, p_actual, psi_part);
    Σ psi_part is the index.
    """
    b = int(bins)
    if lo is None or hi is None:
        bounds = expected.agg(
            F.min(value_col).cast("double").alias("lo"),
            F.max(value_col).cast("double").alias("hi"),
        ).first()
        lo = bounds["lo"] if lo is None else lo
        hi = bounds["hi"] if hi is None else hi
    lo, hi = float(lo), float(hi)
    if not hi > lo:
        raise ValueError(f"degenerate bounds [{lo}, {hi}]")
    width = (hi - lo) / b

    def binned(df: DataFrame, out: str) -> DataFrame:
        bin_ = F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
                F.lit(0),
            ),
            F.lit(b - 1),
        ).cast("int")
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(bin_.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    e = binned(expected, "n_expected")
    a = binned(actual, "n_actual")
    joined = e.join(a, on="bin", how="full_outer").select(
        "bin",
        F.coalesce("n_expected", F.lit(0)).alias("n_expected"),
        F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
    )
    totals = F.broadcast(
        joined.agg(
            F.sum("n_expected").cast("double").alias("_te"),
            F.sum("n_actual").cast("double").alias("_ta"),
        )
    )
    pe = (F.col("n_expected") + F.lit(0.5)) / (F.col("_te") + F.lit(0.5) * b)
    pa = (F.col("n_actual") + F.lit(0.5)) / (F.col("_ta") + F.lit(0.5) * b)
    return joined.crossJoin(totals).select(
        "bin",
        "n_expected",
        "n_actual",
        F.round(pe, 6).alias("p_expected"),
        F.round(pa, 6).alias("p_actual"),
        F.round((pa - pe) * F.log(pa / pe), 6).alias("psi_part"),
    )


def countmin_sketch(
    df: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch of an item stream: the constant-memory
    frequency summary (``depth`` rows × ``width`` counters) whose
    point estimate ``min_d sketch[d][h_d(x)]`` never under-counts and
    over-counts by ≤ ε·N with probability 1−δ (ε = e/width,
    δ = e^−depth) — the approximate tier under ``group_top_terms``'s
    exact heavy hitters.

    Returns the sketch as a relation ``(d, col, cnt)`` — only occupied
    counters are materialized (absent = 0), so the result is
    min(distinct items, width)·depth rows at most. Hashes are
    md5-derived (``d ":" item``), the engine's cross-engine
    determinism workhorse — same sketch everywhere, mergeable across
    corpus shards by summing ``cnt``.

    Scale: ONE scan (the depth hashes fan out per row via posexplode,
    a generator inside codegen, not a union of scans) + ONE
    map-side-combinable count aggregate whose exchange carries at most
    depth·width rows per task — frequency summarization of a 100 TB
    stream with a bounded shuffle.
    """
    if width <= 0 or depth <= 0:
        raise ValueError("width and depth must be positive")
    item = F.col(item_col).cast("string")
    hashes = F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{d}:"), item)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(int(width)),
            )
            for d in range(depth)
        ]
    )
    return (
        df.filter(item.isNotNull())
        .select(F.posexplode(hashes).alias("d", "col"))
        .groupBy(F.col("d").cast("int").alias("d"), "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate item frequencies from a ``countmin_sketch``
    relation: ``est(x) = min_d cnt[d][h_d(x)]`` (0 when a probed
    counter was never touched). ``width``/``depth`` must match the
    sketch's build parameters.

    Scale: probes fan out to their depth counters (projection), the
    sketch side is ≤ depth·width rows — broadcast it — and the min
    re-aggregates per probe. No shuffle of anything corpus-sized.
    """
    item = F.col(item_col).cast("string")
    hashes = F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{d}:"), item)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(int(width)),
            )
            for d in range(depth)
        ]
    )
    fan = probes.select(
        item.alias("_item"), F.posexplode(hashes).alias("d", "col")
    ).withColumn("d", F.col("d").cast("int"))
    joined = fan.join(F.broadcast(sketch), on=["d", "col"], how="left")
    return (
        joined.groupBy(F.col("_item").alias(item_col))
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def zipf_fit(
    df: DataFrame,
    item_col: str,
    top_r: int = 200,
) -> DataFrame:
    """Zipf power-law fit of an item frequency distribution: least
    squares of ln(count) against ln(rank) over the ``top_r`` most
    frequent items, returning one row
    ``(n_points, alpha, intercept)`` with ``count ≈ e^intercept ·
    rank^(−alpha)``. Natural-language corpora sit near alpha ≈ 1
    (Zipf's law) — a corpus that doesn't is machine-generated,
    boilerplate-flooded, or wrongly tokenized, which is why this is a
    standard corpus-health dial next to the fertility/drift monitors.

    Determinism: each ln lands on a 10⁻⁹ lattice (exact long), the
    normal-equation sums run in DECIMAL(38,0) — order-independent
    integer arithmetic end to end; only the final slope/intercept
    divisions are IEEE, identical in any engine, rounded at 6dp.

    Scale: the census is the only corpus-sized job (one aggregate);
    the top-r cut is a TakeOrderedAndProject (per-task top-r, no
    global sort), and the regression is a 1-row aggregate over r rows.
    """
    if top_r < 3:
        raise ValueError("top_r must be >= 3")
    counts = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(F.col(item_col).alias("_it"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_it").asc())
        .limit(int(top_r))
    )
    w = Window.orderBy(F.col("_n").desc(), F.col("_it").asc())
    lat = (
        counts.withColumn("_rank", F.row_number().over(w))
        .select(
            F.round(F.log(F.col("_rank").cast("double")) * 1e9)
            .cast("decimal(38,0)")
            .alias("_x"),
            F.round(F.log(F.col("_n").cast("double")) * 1e9)
            .cast("decimal(38,0)")
            .alias("_y"),
        )
    )
    agg = lat.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_k"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    den = F.col("_k") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope_num = F.col("_k") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    icpt_num = (
        F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy")
    )
    return agg.select(
        F.col("_k").cast("int").alias("n_points"),
        F.round(
            -(slope_num.cast("double") / den.cast("double")), 6
        ).alias("alpha"),
        F.round(
            icpt_num.cast("double") / den.cast("double") / 1e9, 6
        ).alias("intercept"),
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    buckets: int = 64,
) -> DataFrame:
    """Histogram-based equi-join cardinality estimate vs ground truth
    — the what-will-this-join-cost diagnostic next to
    ``join_skew_report``/``fk_audit``. Keys hash (md5) into
    ``buckets``; per bucket the estimate applies the classic
    containment assumption ``rows_a · rows_b / max(distinct_a,
    distinct_b)``, and the exact size joins the two PER-KEY count
    relations (distinct-key-sized — still far cheaper than running
    the join). Returns one row per occupied bucket:
    ``(bucket, na, da, nb, db, est_rows, exact_rows)`` — the buckets
    where est and exact diverge are exactly the skewed/correlated key
    ranges a planner's uniform assumption gets wrong.

    Scale: one map-side-combinable per-key aggregate per side, bucket
    rollups carry ``buckets`` rows, and the exact comparison is an
    equi-join of the two key-count relations.
    """
    if buckets <= 0:
        raise ValueError("buckets must be positive")

    def per_key(df: DataFrame, key: str) -> DataFrame:
        k = F.col(key).cast("string")
        return (
            df.filter(k.isNotNull())
            .groupBy(k.alias("_k"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .withColumn(
                "bucket",
                F.pmod(
                    F.conv(
                        F.substring(F.md5(F.col("_k")), 1, 8), 16, 10
                    ).cast("long"),
                    F.lit(int(buckets)),
                ).cast("int"),
            )
        )
    a = per_key(left, left_key)
    b = per_key(right, right_key)
    ab = a.groupBy("bucket").agg(
        F.sum("_n").alias("na"), F.count(F.lit(1)).alias("da")
    )
    bb = b.groupBy("bucket").agg(
        F.sum("_n").alias("nb"), F.count(F.lit(1)).alias("db")
    )
    exact = (
        a.select("bucket", "_k", F.col("_n").alias("_na"))
        .join(
            b.select(F.col("_k"), F.col("_n").alias("_nb")), on="_k",
            how="inner",
        )
        .groupBy("bucket")
        .agg(F.sum(F.col("_na") * F.col("_nb")).alias("exact_rows"))
    )
    out = (
        ab.join(bb, on="bucket", how="full")
        .join(exact, on="bucket", how="left")
        .select(
            "bucket",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("da", F.lit(0)).alias("da"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
            F.coalesce("db", F.lit(0)).alias("db"),
            F.when(
                F.greatest(F.coalesce("da", F.lit(0)), F.coalesce("db", F.lit(0))) > 0,
                F.round(
                    F.coalesce("na", F.lit(0)).cast("double")
                    * F.coalesce("nb", F.lit(0)).cast("double")
                    / F.greatest(
                        F.coalesce("da", F.lit(0)), F.coalesce("db", F.lit(0))
                    ).cast("double"),
                    2,
                ),
            ).otherwise(F.lit(0.0)).alias("est_rows"),
            F.coalesce("exact_rows", F.lit(0)).alias("exact_rows"),
        )
    )
    return out


def histogram2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_bins: int = 10,
    y_bins: int = 10,
    x_range: tuple | None = None,
    y_range: tuple | None = None,
) -> DataFrame:
    """Equal-width 2-D histogram — the joint-distribution heatmap
    behind correlation triage (is quantity×discount banded? does
    price scale with size?): ``(bx, by, n)`` over x_bins × y_bins
    cells, same clamp-into-end-bins / inclusive-top-edge semantics as
    ``numeric_histogram``, applied per axis. Ranges default to the
    observed min/max (one broadcast 1-row aggregate).

    Scale: cell assignment is a projection; ONE map-side-combinable
    aggregate whose exchange carries ≤ x_bins·y_bins rows per task.
    Rows with a NULL on either axis are excluded.
    """
    xb, yb = int(x_bins), int(y_bins)
    if xb <= 0 or yb <= 0:
        raise ValueError("bins must be positive")
    data = df.select(
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    if x_range is None or y_range is None:
        bounds = F.broadcast(
            data.agg(
                F.min("_x").alias("_xlo"), F.max("_x").alias("_xhi"),
                F.min("_y").alias("_ylo"), F.max("_y").alias("_yhi"),
            )
        )
        staged = data.crossJoin(bounds)
    else:
        staged = (
            data.withColumn("_xlo", F.lit(float(x_range[0])))
            .withColumn("_xhi", F.lit(float(x_range[1])))
            .withColumn("_ylo", F.lit(float(y_range[0])))
            .withColumn("_yhi", F.lit(float(y_range[1])))
        )

    def bin_of(v, lo, hi, n):
        return F.when(F.col(hi) <= F.col(lo), F.lit(0)).otherwise(
            F.least(
                F.greatest(
                    F.floor(
                        (F.col(v) - F.col(lo))
                        * F.lit(float(n))
                        / (F.col(hi) - F.col(lo))
                    ).cast("int"),
                    F.lit(0),
                ),
                F.lit(n - 1),
            )
        )

    return (
        staged.withColumn("bx", bin_of("_x", "_xlo", "_xhi", xb))
        .withColumn("by", bin_of("_y", "_ylo", "_yhi", yb))
        .groupBy("bx", "by")
        .agg(F.count(F.lit(1)).alias("n"))
    )
