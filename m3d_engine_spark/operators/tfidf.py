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

from m3d_engine_spark.functions.text import tokens


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
