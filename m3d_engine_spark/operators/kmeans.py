"""Deterministic Lloyd k-means over an embedding column.

Beyond-reference capability: the TRAINED coarse quantizer the sampled
ones in ``similarity.ivf_topk`` / ``dedup.semantic_dedup`` document as
their swap-in point. Classical Lloyd, made deterministic and
oracle-checkable:

* **Init** — the ``k`` vectors with the lowest ``(md5(id), id)`` rank
  (the stratified_sample recipe): reproducible across engines,
  partitionings and runs, no RNG state.
* **Assignment** — broadcast centroids, per-vector argmax of
  round(cosine, 4) with ties to the lowest cluster id, executed as a
  map-side-combinable ``max_by`` (the exchange carries one row per
  vector, never N×k — same shape as ``semantic_assignments``).
* **Update** — per-(cluster, dimension) means via ``posexplode``; the
  sums run in DECIMAL (exact, order-independent — the quality_zscores
  discipline) and only the final single division happens in double,
  rounded to 6dp. Without this, float summation order would make
  centroids run-dependent and the rounding cascade would diverge
  across iterations and engines.

Centroids are collected to the driver between rounds — k·dim doubles,
the definitionally-broadcastable relation — and re-broadcast; the
corpus is scanned once per iteration and never shuffled beyond the
one keyed argmax exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m3d_engine_spark.functions.vectors import dot, norm


def _assign(base: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """(id, cluster, v) — argmax-cosine cluster per vector; one keyed
    exchange (partial max_by collapses the k centroid rows in-task)."""
    sim = F.round(
        dot(F.col("v"), F.col("centv")) / (F.col("nrm") * F.col("centn")), 4
    )
    return (
        base.crossJoin(F.broadcast(cents))
        .withColumn("_sim", sim)
        .groupBy(id_col)
        .agg(
            F.max_by(
                "cluster",
                F.struct(F.col("_sim").alias("s"), (-F.col("cluster")).alias("nc")),
            ).alias("cluster"),
            F.first("v").alias("v"),
        )
    )


def train_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """Returns (cluster, centroid array<double>, n_members) after
    ``iterations`` Lloyd rounds from the deterministic md5-ranked
    init. Empty clusters keep their previous centroid (standard Lloyd
    degenerate-case handling, and what keeps the round count exact for
    the oracle)."""
    spark: SparkSession = df.sparkSession
    base = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        norm(F.col(vec_col)).alias("nrm"),
    )
    init = (
        df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = {i: list(r["v"]) for i, r in enumerate(init)}

    for _ in range(iterations):
        cents = spark.createDataFrame(
            [(c, v) for c, v in sorted(centroids.items())],
            "cluster int, centv array<double>",
        ).withColumn("centn", norm(F.col("centv")))
        asg = _assign(base, cents, id_col)
        means = (
            asg.select("cluster", F.posexplode("v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(
                F.round(
                    F.sum(F.col("val").cast("decimal(27,10)")).cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("m")
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("dim"), F.col("m")))
                    ),
                    lambda s: s["m"],
                ).alias("centv")
            )
            .collect()
        )
        centroids = {**centroids, **{r["cluster"]: list(r["centv"]) for r in means}}

    cents = spark.createDataFrame(
        [(c, v) for c, v in sorted(centroids.items())],
        "cluster int, centv array<double>",
    ).withColumn("centn", norm(F.col("centv")))
    final = _assign(base, cents, id_col)
    sizes = final.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        cents.select("cluster", F.col("centv").alias("centroid"))
        .join(sizes, on="cluster", how="left")
        .select(
            "cluster",
            "centroid",
            F.coalesce(F.col("n_members"), F.lit(0).cast("long")).alias(
                "n_members"
            ),
        )
    )
