"""Similarity search over embedding columns.

Beyond-reference capability. Two tiers:

* **brute_force_topk** — exact top-k by cosine. The query set is
  broadcast (it is small by construction), so the "cross join" is a
  BroadcastNestedLoopJoin: each executor streams its local shard of the
  corpus once against the in-memory queries — zero shuffle of the
  corpus, which is the only thing that matters at 10⁹ vectors. Ranking
  is a window partitioned by query id.
* **bucketed_ann** — sign-LSH bucketed approximate search: corpus and
  queries are bucketed by the signs of leading components; the join is a
  co-partitioned equi-join on the bucket id, cutting candidates by
  ~2^bits at some recall cost. Swap the bucketer for seeded random
  hyperplanes / IVF centroids without touching the join topology.

Determinism: ranking orders by (round(cosine,4) DESC, id ASC) — total
order, stable across engines and float summation quirks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from m3d_engine_spark.functions.vectors import dot, norm, sign_lsh_bucket


def _ranked_topk(
    pairs: DataFrame, query_id: str, corpus_id: str, k: int
) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus (self-matches
    excluded). Returns (query_id, neighbor_id, rank, cosine)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm(F.col(vec_col)).alias("qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    pairs = c.crossJoin(q).filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).alias("cosine"),
    )
    return _ranked_topk(pairs, "query_id", "neighbor_id", k)


def bucketed_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    lsh_bits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket. Equi-join on bucket ⇒ shuffle/broadcast chosen by Catalyst;
    at scale, bucket the corpus table on `bucket` at write time and the
    probe becomes a bucket-pruned scan."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
        sign_lsh_bucket(F.col(vec_col), lsh_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
        sign_lsh_bucket(F.col(vec_col), lsh_bits).alias("bucket"),
    )
    pairs = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).alias("cosine"),
        )
    )
    return _ranked_topk(pairs, "query_id", "neighbor_id", k)
