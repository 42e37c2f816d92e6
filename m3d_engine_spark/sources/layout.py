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


def hilbert_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    key_col: str = "hkey",
) -> DataFrame:
    """Append ``key_col``: the 2-D Hilbert-curve index of ``cols`` —
    the locality-preserving sibling of ``zorder_key``. Z-order takes
    2^(bits)-sized jumps where its bit interleave wraps (the top-right
    / bottom-left seam); the Hilbert walk moves to a Manhattan-adjacent
    cell at EVERY step (pinned by test), so range scans over the sorted
    key touch strictly fewer distinct value rectangles — the layout
    Databricks moved to for liquid clustering, here as an explicit key.

    Same scaling contract as ``zorder_key``: min/max-shift each column
    onto ``bits`` bits with exact integer arithmetic (broadcast 1-row
    bounds, plan stays lazy). The curve walk is the classic xy→d loop
    expressed as ONE JVM aggregate fold over bit levels with a struct
    accumulator — quadrant = (3·rx) XOR ry written as the polynomial
    3rx + ry − 2·rx·ry and the conditional rotate/flip as arithmetic
    blends, so every step is engine-portable exact integer math (the
    DuckDB oracle unrolls identical levels). 2-D only by design: the
    >2-D "Hilbert" generalizations trade away exactly the adjacency
    guarantee this key exists for — use ``zorder_key`` there.
    """
    cols = list(cols)
    if len(cols) != 2:
        raise ValueError("hilbert_key is 2-D; use zorder_key for other arities")
    bits = int(bits)
    if bits < 1 or 2 * bits > 62:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
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
    staged = df.crossJoin(bounds).select(
        "*",
        *[
            F.expr(
                f"CASE WHEN _mx_{c} - _mn_{c} <= 0 THEN 0L "
                f"ELSE ((CAST({c} AS BIGINT) - _mn_{c}) * {nmax}) "
                f"div (_mx_{c} - _mn_{c}) END"
            ).alias(f"_s_{i}")
            for i, c in enumerate(cols)
        ],
    )
    step = (
        "named_struct("
        "'x', CASE WHEN (CASE WHEN (st.y & s) > 0 THEN 1 ELSE 0 END) = 1 "
        "THEN st.x ELSE (CASE WHEN (st.x & s) > 0 THEN s - 1 - st.y "
        "ELSE st.y END) END, "
        "'y', CASE WHEN (CASE WHEN (st.y & s) > 0 THEN 1 ELSE 0 END) = 1 "
        "THEN st.y ELSE (CASE WHEN (st.x & s) > 0 THEN s - 1 - st.x "
        "ELSE st.x END) END, "
        "'d', st.d + s * s * ("
        "3 * (CASE WHEN (st.x & s) > 0 THEN 1 ELSE 0 END) "
        "+ (CASE WHEN (st.y & s) > 0 THEN 1 ELSE 0 END) "
        "- 2 * (CASE WHEN (st.x & s) > 0 THEN 1 ELSE 0 END) "
        "* (CASE WHEN (st.y & s) > 0 THEN 1 ELSE 0 END)))"
    )
    fold = (
        f"aggregate(transform(sequence({bits - 1}, 0, -1), "
        f"i -> shiftleft(1L, i)), "
        f"named_struct('x', _s_0, 'y', _s_1, 'd', 0L), "
        f"(st, s) -> {step}, st -> st.d)"
    )
    return staged.withColumn(key_col, F.expr(fold)).drop(
        *[f"_mn_{c}" for c in cols],
        *[f"_mx_{c}" for c in cols],
        "_s_0",
        "_s_1",
    )
