"""TF-IDF term scoring over a document corpus.

Beyond-reference capability — the classic "what are this document's
characteristic terms" primitive a curation pipeline uses for topic
filtering, keyword extraction, and near-dup explanation.

Topology (all JVM-side, no UDFs):

    explode tokens → (doc, term) counts            [1 shuffle: doc+term]
    → document frequency per term  (count of docs) [1 shuffle: term]
    → join tf × df on term, × corpus size N        [SMJ on term]
    → score = tf · ln(N / df), top-k per doc       [WindowGroupLimit]

At 100 TB the df relation is vocabulary-sized (≪ corpus); Catalyst
broadcasts it when it fits and sort-merge-joins on the term key when
it does not — either way nothing quadratic. The corpus size N rides
along as a broadcast 1-row aggregate (no driver-side count action, so
the whole thing stays one lazy plan). Top-k per doc is a row_number
window → WindowGroupLimit keeps k rows per doc per task before the
exchange.

Determinism: scores are round(·, 4); ranking orders by
(score DESC, term ASC) — total order, matching the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from m3d_engine_spark.functions.text import md5_uint32, tokens


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by tf·idf with
    idf = ln(N / df_term). Returns (id_col, term, tfidf, rk)."""
    terms = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_rel = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df_rel, on="term")
        .crossJoin(F.broadcast(n_rel))
        .select(
            F.col(id_col),
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


def feature_hash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim_bits: int = 10,
) -> DataFrame:
    """Hashing-trick vectorizer (sklearn's HashingVectorizer, the
    distributed way): each token hashes to one of ``2^dim_bits``
    buckets with an md5-derived ±1 sign, per-document signed counts
    form the sparse feature vector — NO vocabulary pass, NO global
    state, so the mapping is identical across corpus shards, engines
    and time (the property that makes the trick deployable: train and
    inference can never disagree on feature ids). The signed sum makes
    collision noise zero-mean (Weinberger et al. 2009).

    Returns one row per document: ``(id, nnz, indices, values)`` with
    the sparse coordinates as comma-joined strings sorted by bucket
    (string form keeps the relation engine-portable; split to arrays
    at the consumer).

    Scale: token explode → ONE (doc, bucket) map-side-combinable
    aggregate → one per-doc rebuild aggregate. Bucket count bounds
    nothing here (it is a hash range, not a relation), so dim_bits=20
    costs the same as 10.
    """
    if dim_bits < 1 or dim_bits > 30:
        raise ValueError("dim_bits must be in 1..30")
    dim = 1 << dim_bits
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("_t"),
    )
    bucket = F.pmod(
        md5_uint32(F.concat(F.lit("b:"), F.col("_t"))), F.lit(dim)
    )
    sign = F.when(
        F.substring(F.md5(F.concat(F.lit("s:"), F.col("_t"))), 1, 1) < "8",
        F.lit(1),
    ).otherwise(F.lit(-1))
    cells = (
        tok.select("_id", bucket.alias("_b"), sign.alias("_sg"))
        .groupBy("_id", "_b")
        .agg(F.sum("_sg").alias("_v"))
        .filter(F.col("_v") != 0)
    )
    packed = cells.groupBy("_id").agg(
        F.count(F.lit(1)).cast("int").alias("nnz"),
        F.array_sort(F.collect_list(F.struct("_b", "_v"))).alias("_arr"),
    )
    # LEFT join from the input ids: a document with no tokens (or whose
    # every bucket sign-cancelled to 0) still gets its row — nnz=0,
    # empty strings — honoring the one-row-per-document contract
    # instead of silently dropping it from downstream feature joins.
    packed = df.select(F.col(id_col).alias("_id")).join(
        packed, on="_id", how="left"
    )
    return packed.select(
        F.col("_id").alias(id_col),
        F.coalesce("nnz", F.lit(0)).alias("nnz"),
        F.coalesce(
            F.array_join(
                F.expr("transform(_arr, s -> CAST(s._b AS STRING))"), ","
            ),
            F.lit(""),
        ).alias("indices"),
        F.coalesce(
            F.array_join(
                F.expr("transform(_arr, s -> CAST(s._v AS STRING))"), ","
            ),
            F.lit(""),
        ).alias("values"),
    )
