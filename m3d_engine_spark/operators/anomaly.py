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
    valid = v.isNotNull() & ~F.isnan(v)
    x = F.when(valid, F.round(v * scale).cast("long"))
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
        F.sum(x * x).over(w).alias("_sxx"),
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
