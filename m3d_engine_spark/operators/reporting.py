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
