"""Declarative data-quality expectations over any relation.

Beyond-reference capability on the reliability surface next to
``reporting.fk_audit`` (referential integrity) and
``reporting.data_profile`` (shape): the great-expectations-style
contract check — a table of named boolean rules evaluated in ONE pass,
returning a per-rule violation census a pipeline can gate on. This is
the params-friendly form (rules are plain SQL predicate strings, so
they live in the same JSON config files as everything else in this
engine).

NULL-fails-closed: a rule evaluating to NULL counts as a violation
(SQL ``CHECK`` lets NULL pass; data contracts must not — an
unexpectedly NULL column is exactly what the check exists to catch).
Write ``col IS NULL OR …`` when NULLs are acceptable.

Scale: all rules fold into one map-side-combinable aggregate over one
scan — checking 50 rules costs one pass, not 50 (the
``data_profile`` discipline); the unpivot reshapes the 1-row result.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expectations_check(
    df: DataFrame, rules: Mapping[str, str]
) -> DataFrame:
    """Evaluate every rule (name → SQL boolean predicate, TRUE = row
    passes) and return one row per rule:
    ``(rule, n_rows, n_violations, violation_rate, passed)`` with
    ``passed = 1`` iff no row violates. Rule order is preserved in
    the output relation's construction but the result is a relation —
    order by ``rule`` for display."""
    if not rules:
        raise ValueError("at least one rule is required")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (name, pred) in enumerate(rules.items()):
        aggs.append(
            F.sum(
                F.when(F.coalesce(F.expr(pred), F.lit(False)), 0).otherwise(1)
            ).alias(f"_v{i}")
        )
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{name.replace(chr(39), chr(39) * 2)}', _v{i}"
        for i, name in enumerate(rules)
    )
    return row.select(
        F.expr(
            f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
        ),
        F.col("_n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias(
            "violation_rate"
        ),
        F.when(F.col("n_violations") == 0, 1).otherwise(0).cast("int")
        .alias("passed"),
    )
