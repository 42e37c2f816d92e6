"""Temporal joins Spark lacks as built-ins: as-of join and
point-in-interval (range) join.

Beyond-reference capability (the reference engine has no temporal
joins); both are staples of a large-scale event/feature pipeline —
"attach the latest state as of this event" and "which window does this
event fall into". Implemented as compositions of existing DataFrame
ops, never per-key Python:

* ``asof_join`` — the union+window trick: tag right rows, union by
  key+time, carry the last right value forward with
  ``last(..., ignorenulls=True)`` over a key-partitioned window, keep
  left rows. ONE shuffle on the key, whole-stage codegen end-to-end —
  at 100 TB this is a plain repartition+sort, no join explosion, no
  Python. (pandas users know this as ``merge_asof``.)
* ``bucketed_range_join`` — the classic bucketed interval join: quantize
  the left point to a time bucket, explode each right interval into the
  buckets it covers, equi-join on (key, bucket), refine with the exact
  BETWEEN predicate. Each left row owns exactly one bucket, so a
  qualifying pair matches exactly once — no post-join dedup. Without
  the bucketing Spark plans interval predicates as BroadcastNestedLoop
  — quadratic and undistributable at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the right row with
    the greatest ``right_ts`` <= ``left_ts`` (direction='backward'; the
    inclusive match mirrors DuckDB/pandas ``ASOF JOIN`` with ``>=``) or
    the least ``right_ts`` >= ``left_ts`` ('forward') within the same
    ``on`` key group. Left rows with no match keep NULLs (left-outer
    semantics). Right must be unique per (on, right_ts) — pre-aggregate
    if it is not, or the carried value is plan-order-dependent.

    Returns the left columns plus one ``<col>`` per value_col and
    ``_matched_ts`` (the matched right timestamp, NULL when unmatched).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    value_cols = list(value_cols)
    left_cols = left.columns
    # Right rows sort BEFORE left rows at equal ts so the equal-ts right
    # row is visible to the left row (inclusive match), in both
    # directions.
    # NULL timestamps never participate: a NULL right_ts row sorts
    # first (nulls-first asc) and its VALUE would be carried to left
    # rows with a NULL _matched_ts — an inconsistent pair that violates
    # the no-match-keeps-NULLs contract; a NULL left_ts row would
    # spuriously match under the forward (desc) ordering.
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.col(right_ts).alias("_matched_ts"),
        *[F.col(c) for c in value_cols],
    )
    l = left.filter(F.col(left_ts).isNotNull()).select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r.schema["_matched_ts"].dataType).alias("_matched_ts"),
        *[
            F.lit(None).cast(r.schema[c].dataType).alias(c)
            for c in value_cols
        ],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    order: list[Column] = [F.col("_ts"), F.col("_is_left")]
    if direction == "forward":
        order = [F.col("_ts").desc(), F.col("_is_left")]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = {
        c: F.last(F.when(F.col("_is_left") == 0, F.col(c)), ignorenulls=True).over(w)
        for c in ["_matched_ts", *value_cols]
    }
    return (
        unioned.withColumns(carried)
        .filter(F.col("_is_left") == 1)
        .select(*left_cols, "_matched_ts", *value_cols)
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: Column | int,
    point_to_long: Column | None = None,
    start_to_long: Column | None = None,
    end_to_long: Column | None = None,
) -> DataFrame:
    """Inner point-in-interval join: left rows whose ``left_point`` falls
    in [right_start, right_end] of a right interval with matching ``on``
    keys — every qualifying (left, right) pair, exactly once.

    ``bucket_width`` is the quantization grain in the units of the long
    mapping (defaults: timestamps → epoch micros). Pick it near the
    typical interval length: each interval explodes into
    ``len/width + 1`` bucket rows while each left row stays single —
    the join stays an equi-join with bounded fan-out instead of the
    BroadcastNestedLoopJoin Spark plans for raw inequality conditions.
    """
    from m3d_engine_spark.functions.epoch import epoch_us_of

    on = list(on)
    # Non-key column name clashes between the two sides would emit
    # duplicate output columns (every downstream by-name reference
    # ambiguous) — refuse loudly, like interval_overlap_join.
    clash = [
        c for c in left.columns
        if c in right.columns and c not in on
    ]
    if clash:
        raise ValueError(
            f"bucketed_range_join: non-key columns present on both "
            f"sides: {clash}; rename or drop one side's"
        )
    # Temp names must not clobber user data (the bloom_probe
    # convention): derive a prefix no existing column starts with.
    pre = "_brj"
    while any(
        c.startswith(pre) for c in (*left.columns, *right.columns)
    ):
        pre += "x"
    pc, sc, ec, bc = f"{pre}_p", f"{pre}_s", f"{pre}_e", f"{pre}_bucket"
    # Defaults are type-agnostic (TIMESTAMP / TIMESTAMP_NTZ / epoch-ns
    # long all accepted) so a testdata encoding change cannot break the
    # operator mid-plan.
    p = point_to_long if point_to_long is not None else epoch_us_of(left, left_point)
    s = start_to_long if start_to_long is not None else epoch_us_of(right, right_start)
    e = end_to_long if end_to_long is not None else epoch_us_of(right, right_end)
    width = bucket_width if isinstance(bucket_width, Column) else F.lit(bucket_width)
    lb = left.withColumn(pc, p).withColumn(
        bc, F.floor(F.col(pc) / width)
    )
    rb = (
        right.withColumn(sc, s)
        .withColumn(ec, e)
        .withColumn(
            bc,
            F.explode(
                F.sequence(
                    F.floor(F.col(sc) / width), F.floor(F.col(ec) / width)
                )
            ),
        )
    )
    joined = lb.join(rb, on=on + [bc], how="inner").filter(
        (F.col(pc) >= F.col(sc)) & (F.col(pc) <= F.col(ec))
    )
    return joined.drop(bc, pc, sc, ec)


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str | Column | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream:
    condense consecutive rows whose tracked attributes did not change,
    then derive the validity interval of each surviving version.

    The warehouse staple the reference's DeltaLoad condensation stops
    one step short of (DeltaLoadActor.scala keeps only the LATEST
    record per key; SCD2 keeps every distinct state with its validity
    window): given one row per observed state of a key ordered by
    ``order_cols``, emit one row per *state change* carrying

    * ``valid_from`` — the change's own ordering value,
    * ``valid_to``   — the next change's ordering value (NULL while
      current, the half-open ``[from, to)`` convention),
    * ``version``    — 1-based change sequence per key,
    * ``is_current`` — 1 on the open row.

    ``ts_col`` (default: the first of ``order_cols``) is the column the
    validity bounds are read from. Attribute comparison is null-safe on
    the struct of ``attr_cols``, so NULL→value and value→NULL both count
    as changes.

    Scale: both windows (the change-detect lag and the validity lead /
    version number) partition on ``key_cols`` with the same ordering,
    and the filter between them preserves partitioning and order — ONE
    exchange on the key for the whole history build, no join anywhere.
    At 100 TB this is the same repartition+sort any per-key condensation
    pays, which is the floor.
    """
    keys = list(key_cols)
    order = [F.col(c) for c in order_cols]
    attrs = list(attr_cols)
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    if ts is None:
        ts = F.col(list(order_cols)[0])
    w = Window.partitionBy(*keys).orderBy(*order)
    state = F.struct(*[F.col(c) for c in attrs])
    changed = df.withColumn(
        "_prev", F.lag(state).over(w)
    ).filter(F.col("_prev").isNull() | ~state.eqNullSafe(F.col("_prev")))
    return (
        changed.withColumn("valid_from", ts)
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("version", F.row_number().over(w).cast("int"))
        .withColumn(
            "is_current",
            F.when(F.col("valid_to").isNull(), F.lit(1)).otherwise(F.lit(0)).cast("int"),
        )
        .select(
            *keys, *attrs, "valid_from", "valid_to", "version", "is_current"
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int | Column,
) -> DataFrame:
    """Interval×interval overlap join within a key group: pair every
    left interval with every right interval of the same ``on`` key
    whose ranges intersect (closed intervals,
    ``l.start <= r.end AND r.start <= l.end``).

    The third temporal primitive next to ``asof_join`` (point→latest
    state) and ``bucketed_range_join`` (point→containing interval):
    "which activity sessions overlapped an incident window". Spark
    plans the raw inequality pair as BroadcastNestedLoop — quadratic
    per key group; here BOTH sides explode into the time buckets they
    cover and equi-join on (key, bucket), so a pair is only examined
    in buckets both intervals touch. An overlapping pair shares
    EVERY bucket of ``[max(starts), min(ends)]`` — to emit it exactly
    once, an ownership rule keeps the pair only in the FIRST shared
    bucket, ``floor(max(l.start, r.start) / width)``, which both
    sides provably cover. No post-join dedup, no row explosion beyond
    bucket fan-out.

    ``bucket_width`` is in the units of the four (numeric) interval
    columns; pick it near the typical interval length — too small
    explodes long intervals into many buckets, too large packs
    unrelated intervals into one bucket (the classic dial, same as
    ``bucketed_range_join``).

    Scale: one exchange per side keyed on (key, bucket); collision
    volume is bounded by real temporal locality, never |left|×|right|.
    """
    on = list(on)
    width = bucket_width if isinstance(bucket_width, Column) else F.lit(int(bucket_width))
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(
            f"non-key columns must be disjoint between sides: {sorted(clash)}"
        )
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / width),
                F.floor(F.col(left_end) / width),
            )
        ),
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / width),
                F.floor(F.col(right_end) / width),
            )
        ),
    )
    joined = lb.join(rb, on=on + ["_bucket"], how="inner").filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (
            F.floor(
                F.greatest(F.col(left_start), F.col(right_start)) / width
            )
            == F.col("_bucket")
        )
    )
    return joined.drop("_bucket")


def linear_interpolate(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tie_cols: Sequence[str] = (),
    out_dp: int = 4,
) -> DataFrame:
    """Gap-fill a sparse per-key time series: every NULL value between
    two known points takes the linear blend of its neighbors,
    ``prev + (next − prev)·(t − t_prev)/(t_next − t_prev)`` — the
    imputation sibling of ``asof_join``'s carry-forward (asof answers
    "last known state", this answers "best estimate between
    samples"; sensor/feature pipelines need both). NULLs before the
    first or after the last known point stay NULL (no
    extrapolation).

    Appends ``<value>_filled`` and ``interpolated`` (1 on filled
    rows). ``ts_col`` must be numeric (convert timestamps with
    ``functions/epoch.epoch_us``).

    Scale: two frames (last-known-before, first-known-after) over ONE
    key-partitioned sort — Spark plans both directions on a single
    exchange; the blend is a projection. The textbook
    groupby-apply-pandas-interpolate, with no Python and no per-key
    memory.
    """
    keys = [F.col(c) for c in key_cols]
    ts = F.col(ts_col)
    v = F.col(value_col)
    # tie columns pin the frame order under duplicate timestamps —
    # without them, which neighbor "precedes" a tied row is
    # partitioning luck and the fill is nondeterministic
    order = [ts.asc()] + [F.col(c).asc() for c in tie_cols]
    wb = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_ts = F.when(v.isNotNull(), ts)
    known_v = F.when(v.isNotNull(), v)
    prev_ts = F.last(known_ts, ignorenulls=True).over(wb)
    prev_v = F.last(known_v, ignorenulls=True).over(wb)
    next_ts = F.first(known_ts, ignorenulls=True).over(wf)
    next_v = F.first(known_v, ignorenulls=True).over(wf)
    blend = F.when(
        next_ts == prev_ts, prev_v
    ).otherwise(
        prev_v
        + (next_v - prev_v)
        * (ts - prev_ts).cast("double")
        / (next_ts - prev_ts).cast("double")
    )
    filled = F.when(v.isNotNull(), v.cast("double")).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(), F.round(blend, out_dp)
        )
    )
    return df.withColumn(f"{value_col}_filled", filled).withColumn(
        "interpolated",
        (v.isNull() & filled.isNotNull()).cast("int"),
    )


# --------------------------------------------------------------------------
# CLI algorithm: params-driven dispatch (the load-algorithm pattern)
# --------------------------------------------------------------------------

from m3d_engine_spark.operators.base import Algorithm, register  # noqa: E402


@register("Scd2History")
class Scd2HistoryAlgorithm(Algorithm):
    """``scd2_history`` behind the JSON-params dispatch — the
    dimension-building sibling of DeltaLoad's latest-record
    condensation, invocable like any load algorithm:

        python -m m3d_engine_spark Scd2History params.json

    Config keys: source_location OR source_table; key_columns (list),
    order_columns (list), attr_columns (list); ts_column (optional,
    defaults to the first order column); target_location OR
    target_table (+ the shared write_output extras).
    """

    def read(self) -> list[DataFrame]:
        if self.params.has("source_table"):
            return [self.spark.table(self.params.get_string("source_table"))]
        return [
            self.spark.read.parquet(self.params.get_string("source_location"))
        ]

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        p = self.params
        return [
            scd2_history(
                dfs[0],
                key_cols=[str(c) for c in p.get_list("key_columns")],
                order_cols=[str(c) for c in p.get_list("order_columns")],
                attr_cols=[str(c) for c in p.get_list("attr_columns")],
                ts_col=p.get_optional("ts_column", None),
            )
        ]

    def write(self, dfs: list[DataFrame]) -> None:
        from m3d_engine_spark.sources.writers import write_output

        write_output(self.spark, dfs[0], self.params)
