"""Multi-dimensional file layout: Z-order clustering for data skipping.

Beyond-reference capability — the lakehouse `OPTIMIZE ... ZORDER BY`
primitive, expressed Spark-natively. A table range-partitioned and
sorted on a SINGLE column skips files for predicates on that column
only; interleaving the bits of several columns into one Z-value makes
files compact in EVERY interleaved dimension at once, so parquet
min/max footer stats prune scans for predicates on any of them.

How it runs:

    per-column (min, max) as ONE broadcast 1-row aggregate   [no driver action]
    → scale each column to an integer in [0, 2^bits)         [projection]
      (exact integer arithmetic — (x−mn)·(2^bits−1) div (mx−mn);
       no floats, so the key is bit-stable across engines)
    → interleave bits into the Z-value                       [projection]
    → repartitionByRange(z) + sortWithinPartitions(z)        [1 range exchange]
    → write                                                  [narrow]

The single range exchange is the entire cost — the same shuffle a
1-column sorted write would pay — and it buys locality in all
dimensions. repartitionByRange samples the Z-key to build balanced
range bounds, so output files are even-sized regardless of key skew;
within a file, rows are Z-sorted so page-level stats prune too.

Scale note: ``bits`` bounds resolution, not correctness — 16 bits per
column keeps 2 columns in an int32-sized key; 4 columns need
``bits ≤ 15`` (the key must stay under the long's 63 value bits — bit
63 is the sign and would break range ordering; the guard enforces
this). Collisions inside a Z-cell only reduce pruning granularity.
Columns with mx == mn degenerate to a constant 0 contribution
(guarded).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Append ``key_col``: the Z-order (Morton) interleave of ``cols``.

    Each column is min/max-scaled to ``bits`` bits with EXACT integer
    arithmetic (long multiply + integral ``div``), then bit ``b`` of
    column ``i`` lands at Z-bit ``b·ncols + i``. Columns must be
    integral (cast dates/timestamps to days/epoch first); the (min,
    max) relation is a broadcast 1-row aggregate, so the plan stays
    lazy and nothing runs on the driver.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{bits} bits x {len(cols)} columns exceeds the 63-bit Z-key"
        )
    nmax = (1 << bits) - 1
    bounds = F.broadcast(
        df.agg(
            *[
                a
                for c in cols
                for a in (
                    F.min(c).cast("long").alias(f"_mn_{c}"),
                    F.max(c).cast("long").alias(f"_mx_{c}"),
                )
            ]
        )
    )
    with_bounds = df.crossJoin(bounds)
    # Exact integral division via SQL `div` (matches DuckDB's `//` for
    # the non-negative operands produced by the min-shift).
    scaled_exprs = []
    for c in cols:
        scaled_exprs.append(
            F.expr(
                f"CASE WHEN _mx_{c} - _mn_{c} <= 0 THEN 0L "
                f"ELSE ((CAST({c} AS BIGINT) - _mn_{c}) * {nmax}) "
                f"div (_mx_{c} - _mn_{c}) END"
            ).alias(f"_s_{c}")
        )
    staged = with_bounds.select("*", *scaled_exprs)
    ncols = len(cols)
    terms = " + ".join(
        f"shiftleft(shiftright(_s_{c}, i) & 1L, i * {ncols} + {idx})"
        for idx, c in enumerate(cols)
    )
    z = F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc + {terms})"
    )
    drop = [f"_mn_{c}" for c in cols] + [f"_mx_{c}" for c in cols] + [
        f"_s_{c}" for c in cols
    ]
    return staged.withColumn(key_col, z).drop(*drop)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 8,
    file_format: str = "parquet",
) -> None:
    """Write ``df`` Z-clustered on ``cols``: one range exchange on the
    Z-key (balanced bounds via sampling), Z-sorted within each file,
    key dropped from the payload. Files then carry tight min/max
    footer stats in every interleaved dimension."""
    keyed = zorder_key(df, cols, bits=bits, key_col="_z")
    (
        keyed.repartitionByRange(int(num_files), F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.format(file_format)
        .mode("overwrite")
        .save(path)
    )
