"""Bigram collocations by pointwise mutual information (PMI).

Beyond-reference capability — the corpus-statistics primitive behind
phrase detection ("new york" is one token), tokenizer-merge candidates,
and corpus-quality probes.

    PMI(x, y) = ln( p(x,y) / (p(x) · p(y)) )
              = ln( (c_xy / N_bigrams) / ((c_x / N_tokens)·(c_y / N_tokens)) )

Topology: one explode to bigram rows (adjacent token pairs, generated
by an index transform — no self-join of token positions), then three
map-side-combinable count aggregations (bigrams, unigrams, totals);
unigram counts join back onto the bigram relation twice — Catalyst
broadcasts them when vocabulary-sized, SMJs on the word key otherwise.
A minimum-count filter bounds the tail before the join (rare bigrams
dominate the relation but can never rank: their PMI is noise by
definition), which is also what keeps the join input small at 100 TB.

Determinism: counts are exact integers; PMI is one double ln of an
exact rational, rounded to 4dp; ranking by (pmi DESC, w1, w2) is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m3d_engine_spark.functions.text import tokens


def pmi_bigrams(
    docs: DataFrame,
    text_col: str,
    min_count: int = 5,
    top: int = 50,
) -> DataFrame:
    """Top ``top`` bigrams by PMI among those occurring ≥ ``min_count``
    times. Returns (w1, w2, n_pair, pmi) ordered by (pmi DESC, w1, w2).
    """
    toks = docs.select(tokens(F.col(text_col)).alias("t"))
    # zip_with over two slices, not sequence(1, size-1): for docs with
    # <2 tokens the sequence form turns DESCENDING ([1,0]) and the
    # transform indexes t[-1]/t[1] — an INVALID_ARRAY_INDEX abort under
    # ANSI mode. greatest(size-1, 0) makes both slices empty instead.
    bigrams = toks.select(
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, greatest(size(t) - 1, 0)),"
                " slice(t, 2, greatest(size(t) - 1, 0)),"
                " (x, y) -> struct(x AS w1, y AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    pair_counts = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    unigrams = toks.select(F.explode(F.col("t")).alias("w"))
    uni_counts = unigrams.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    totals = F.broadcast(
        bigrams.agg(F.count(F.lit(1)).cast("double").alias("n_bigrams")).crossJoin(
            unigrams.agg(F.count(F.lit(1)).cast("double").alias("n_tokens"))
        )
    )
    scored = (
        pair_counts.join(
            uni_counts.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")),
            on="w1",
        )
        .join(
            uni_counts.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")),
            on="w2",
        )
        .crossJoin(totals)
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("n_bigrams"))
                    / (
                        (F.col("n_w1") / F.col("n_tokens"))
                        * (F.col("n_w2") / F.col("n_tokens"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1"), F.col("w2")
    ).limit(top)
