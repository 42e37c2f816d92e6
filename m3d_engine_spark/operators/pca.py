"""Distributed covariance / PCA for embedding columns.

Beyond-reference capability. Embedding post-processing (whitening,
dimensionality reduction before clustering or dedup, the "remove the
dominant direction" trick for sentence embeddings) starts with the
d×d covariance matrix of a corpus-sized vector column. The shape of
the computation at 100 TB:

* the covariance needs ``Σ x_i·x_j`` for every dim pair — N·d²/2
  multiply-adds no matter how it is written. Here it is written as two
  chained ``posexplode`` generators (upper triangle per row) feeding
  ONE map-side-combinable aggregate, so the exchange carries at most
  d·(d+1)/2 rows per task — the FLOPs distribute, the shuffle does
  not grow with N. (An Arrow kernel computing per-partition numpy
  Gram partials would trade JVM fan-out CPU for Python dispatch; the
  aggregate topology — tiny keyed exchange — would be identical.)
* the eigendecomposition of a d×d matrix is a DRIVER-side numpy call
  (d ≤ a few thousand — microscopic next to the corpus): exactly the
  k-row-collect discipline of ``kmeans.py``. The resulting components
  broadcast back as literals and projection is a zero-exchange JVM
  fold per row.

Determinism: embedding floats cast to double are exact; a float×float
product in double is EXACT (24+24 mantissa bits < 53), and the sums go
through DECIMAL(38,12) — order-independent — so the covariance matrix
is bit-identical across engines and partitionings up to the final
(identically-associated) IEEE division, rounded at 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _vec_base(df: DataFrame, vec_col: str) -> DataFrame:
    """Non-null vectors cast to double — the corpus both moment
    passes scan."""
    v = F.col(vec_col).cast("array<double>")
    return df.select(v.alias("_v")).filter(F.col("_v").isNotNull())


def _pair_products(base: DataFrame) -> DataFrame:
    """Upper-triangle second moments: one row per dim pair (i <= j)
    with the exact decimal-summed ``Σ x_i·x_j`` (as double). Two
    chained generators, one map-side-combinable aggregate — the
    exchange is ≤ d(d+1)/2 rows per task regardless of N."""
    e1 = base.select("_v", F.posexplode("_v").alias("i", "_xi"))
    e2 = e1.select(
        "i",
        "_xi",
        F.posexplode(
            F.slice(F.col("_v"), F.col("i") + F.lit(1), F.size("_v"))
        ).alias("_p", "_xj"),
    ).select(
        F.col("i"),
        (F.col("i") + F.col("_p")).alias("j"),
        (F.col("_xi") * F.col("_xj")).alias("_xy"),
    )
    return e2.groupBy("i", "j").agg(
        F.sum(F.col("_xy").cast("decimal(38,12)")).cast("double").alias("_sxy")
    )


def _dim_sums(base: DataFrame) -> DataFrame:
    """First moments: d rows of exact decimal-summed ``Σ x_i``."""
    return (
        base.select(F.posexplode("_v").alias("i", "_x"))
        .groupBy("i")
        .agg(F.sum(F.col("_x").cast("decimal(38,12)")).cast("double").alias("_s"))
    )


def embedding_covariance(
    df: DataFrame, vec_col: str, out_dp: int = 6
) -> DataFrame:
    """Upper-triangle covariance matrix of an ``array<float|double>``
    column: one row per dim pair ``(i, j)`` with ``i <= j`` (0-based),
    columns ``(i, j, n, cov)`` where
    ``cov = (Σ x_i·x_j − Σx_i·Σx_j / n) / n`` (population covariance).

    Scale: two generator fan-outs (no join, no second scan) + one
    aggregate keyed on the (i, j) pair — map-side combine collapses
    each task to ≤ d(d+1)/2 partial rows; per-dim sums ride a d-row
    broadcast join; n is a broadcast 1-row aggregate.
    """
    base = _vec_base(df, vec_col)
    stats = base.agg(F.count(F.lit(1)).alias("_n"))
    sxy = _pair_products(base)
    sums = _dim_sums(base)
    si = F.broadcast(sums.select(F.col("i").alias("_di"), F.col("_s").alias("_sxi")))
    sj = F.broadcast(sums.select(F.col("i").alias("_dj"), F.col("_s").alias("_sxj")))
    return (
        sxy.join(si, F.col("i") == F.col("_di"))
        .join(sj, F.col("j") == F.col("_dj"))
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.col("_n").alias("n"),
            (
                F.round(
                    (F.col("_sxy") - F.col("_sxi") * F.col("_sxj") / F.col("_n"))
                    / F.col("_n"),
                    out_dp,
                )
                + F.lit(0.0)  # IEEE: -0.0 + 0.0 = +0.0, so zero is one value
            ).alias("cov"),
        )
    )


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    out_dp: int = 6,
) -> DataFrame:
    """Project embeddings onto their top-``k`` principal components.

    Moments via the shared ``embedding_covariance`` relations — ONE
    d-row first-moment pass (which also yields the per-dim means the
    centering needs, no extra corpus scan) and ONE d²/2-row
    second-moment pass; the covariance matrix is assembled driver-side
    from those exact decimal sums (the k-row-collect discipline),
    eigendecomposed with numpy.linalg.eigh (symmetric, deterministic),
    and the components broadcast back as literals; projection is a
    zero-exchange ``zip_with``+``aggregate`` fold per row (no Python
    in the per-row path). Component sign is normalized (largest-|w|
    coordinate positive) so results don't flip run to run.

    Scores are CENTERED: the fold computes ``x·w`` and the constant
    ``μ·w`` (per-dim means dotted with each component driver-side) is
    subtracted before rounding, so the returned coordinates are
    ``(x−μ)·w`` — what whitening and remove-the-dominant-direction
    expect. (Uncentered ``x·w`` would be offset by ``μ·w`` per
    component: harmless for pairwise distances, wrong for everything
    that treats 0 as the corpus center.)

    Returns ``(id_col, pc)`` where ``pc`` is the length-k projection
    array, each coordinate rounded at ``out_dp``.
    """
    import numpy as np

    base = _vec_base(df, vec_col)
    sum_rows = (
        _dim_sums(base)
        .crossJoin(F.broadcast(base.agg(F.count(F.lit(1)).alias("_n"))))
        .collect()
    )
    if not sum_rows:
        raise ValueError("pca_project: no non-null vectors")
    n = sum_rows[0]._n
    d = max(r.i for r in sum_rows) + 1
    if not 0 < k <= d:
        raise ValueError(f"k must be in 1..{d}")
    s = np.zeros(d)
    for r in sum_rows:
        s[r.i] = r._s
    mu = s / n
    sxy_rows = _pair_products(base).collect()
    mat = np.zeros((d, d))
    for r in sxy_rows:
        cov = (r._sxy - s[r.i] * s[r.j] / n) / n
        mat[r.i, r.j] = cov
        mat[r.j, r.i] = cov
    vals, vecs = np.linalg.eigh(mat)  # ascending eigenvalues
    comps = []
    offsets = []
    for c in range(1, k + 1):
        w = vecs[:, -c]
        # sign convention: the largest-magnitude coordinate is positive
        w = w * (1.0 if w[int(np.argmax(np.abs(w)))] >= 0 else -1.0)
        comps.append([float(x) for x in w])
        offsets.append(float(mu @ w))
    v = F.col(vec_col).cast("array<double>")
    pcs = F.array(
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        v,
                        F.array(*[F.lit(x) for x in comp]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                - F.lit(off),
                out_dp,
            )
            for comp, off in zip(comps, offsets)
        ]
    )
    return df.select(F.col(id_col), pcs.alias("pc"))
