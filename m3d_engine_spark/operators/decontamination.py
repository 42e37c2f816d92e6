"""Benchmark decontamination + intra-document repetition signals.

Beyond-reference capability — two standard pre-training curation
passes:

* **Decontamination**: a training document is "contaminated" when it
  shares n-gram shingles with an evaluation benchmark; contaminated
  docs must be found (and dropped) before training. The probe set is
  benchmark-sized (thousands of docs, millions of shingles at most) —
  corpus-sized it is not, so the topology is: explode the CORPUS side
  into shingle rows once, equi-join against the (distinct) probe
  shingles — Catalyst broadcasts probe shingles when they fit, SMJs on
  the shingle key when they do not — and count hits per document. The
  corpus is scanned once; nothing is quadratic; the join relation is
  corpus-shingles × matching-probes only.

* **Repetition stats**: the fraction of repeated n-gram shingles
  inside each document (RefinedWeb/Gopher-style quality rule: highly
  repetitive docs are boilerplate or generation loops). A map-only
  projection — size and distinct-size of the shingle array — with no
  shuffle at all.

Shingle definition is shared with the dedup family
(``operators/dedup.py::shingle_array``: space-joined token n-grams,
whole text when shorter than n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m3d_engine_spark.operators.dedup import shingle_array


def contamination_check(
    docs: DataFrame,
    probes: DataFrame,
    id_col: str,
    text_col: str,
    probe_text_col: str | None = None,
    n: int = 3,
) -> DataFrame:
    """(id_col, n_hits) for every document sharing ≥ 1 n-gram shingle
    with any probe document. ``probes`` is the benchmark set (small by
    construction). n_hits = number of DISTINCT probe shingles the doc
    contains."""
    probe_text_col = probe_text_col or text_col
    probe_shingles = (
        probes.select(
            F.explode(shingle_array(F.col(probe_text_col), n)).alias("sh")
        )
        .distinct()
    )
    doc_shingles = docs.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(shingle_array(F.col(text_col), n))
        ).alias("sh"),
    )
    return (
        doc_shingles.join(probe_shingles, on="sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """(id_col, n_shingles, n_distinct, dup_ratio) per document, where
    dup_ratio = 1 − distinct/total shingles (0 when the doc has ≤ 1
    shingle). Pure projection — stays inside whole-stage codegen."""
    sh = shingle_array(F.col(text_col), n)
    total = F.size(sh)
    distinct = F.size(F.array_distinct(sh))
    return docs.select(
        F.col(id_col),
        total.cast("int").alias("n_shingles"),
        distinct.cast("int").alias("n_distinct"),
        F.when(
            total > 1,
            F.round(F.lit(1.0) - distinct.cast("double") / total, 4),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ratio"),
    )
