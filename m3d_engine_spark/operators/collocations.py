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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from m3d_engine_spark.functions.text import tokens


def _pmi_scored(
    pairs: DataFrame,
    unigrams: DataFrame,
    pair_counts: DataFrame,
    extra_cols: list[str],
    top: int,
) -> DataFrame:
    """The shared PMI score-and-rank tail under ``pmi_bigrams`` and
    ``skipgram_pairs``: join both unigram marginals onto the
    min-count-filtered pair counts, normalize by the broadcast pair and
    token totals, ln + 4dp, rank by (pmi desc, w1, w2), keep ``top``.
    One definition so a denominator or rounding change cannot drift
    between the two operators' oracle twins."""
    uni_counts = unigrams.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    totals = F.broadcast(
        pairs.agg(F.count(F.lit(1)).cast("double").alias("n_pairs")).crossJoin(
            unigrams.agg(F.count(F.lit(1)).cast("double").alias("n_tokens"))
        )
    )
    return (
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
            *extra_cols,
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("n_pairs"))
                    / (
                        (F.col("n_w1") / F.col("n_tokens"))
                        * (F.col("n_w2") / F.col("n_tokens"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("w1"), F.col("w2"))
        .limit(int(top))
    )


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
    return _pmi_scored(bigrams, unigrams, pair_counts, [], top)


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 3,
    top: int = 50,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Pairwise association rules over baskets — support / confidence
    / lift for item pairs (the market-basket classic; in curation the
    same census over (document, source/tag/domain) baskets surfaces
    co-occurrence structure a pointwise score hides). PMI is ln(lift)
    over token adjacency; this operator works on BASKET membership
    and reports the thresholded rule metrics.

        support(a,b) = c_ab / N            (N = distinct baskets)
        conf(a→b)    = c_ab / c_a
        lift(a,b)    = c_ab · N / (c_a · c_b)

    Topology (the pmi_bigrams discipline): membership is
    de-duplicated ONCE to distinct (basket, item); pairs come from a
    keyed self-equi-join on the basket id (a < b orients, never
    all-pairs across baskets); the min-count filter bounds the pair
    relation BEFORE the two item-count lookups join back (broadcast
    when vocabulary-sized); N rides a broadcast 1-row aggregate — no
    driver count. All counts exact longs; metrics are single IEEE
    divisions of exact integers (engine-identical), 4dp.

    ``max_basket_size`` is the scale dial: the self-join emits
    k·(k−1)/2 rows for a k-item basket — quadratic per basket, so ONE
    hot basket (a crawl dump tagged with 10⁴ labels) dominates the
    whole job. With the cap set, each basket keeps its deterministic
    md5-ranked top-k items (the ``stratified_sample`` discipline —
    seed-free, engine-reproducible) for PAIR GENERATION ONLY; item
    counts and the basket total N stay exact over full membership.
    Documented relaxation: for pairs touching an over-cap basket,
    ``n_pair`` (hence support/conf/lift) becomes a lower bound — a
    uniform-at-random one, since md5 ranking is independent of item
    identity. Baskets at or under the cap are unaffected; with
    cap ≥ max basket size the output is provably identical (pinned).

    Returns (a, b, n_pair, support, conf_ab, conf_ba, lift) ordered
    by (lift DESC, a, b), limited to ``top``.
    """
    m = (
        baskets.select(
            F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
        )
        .distinct()
    )
    pair_src = m
    if max_basket_size is not None:
        # Per-basket deterministic top-k, executing as WindowGroupLimit:
        # each task forwards at most k rows per basket BELOW the
        # self-join's exchange — the quadratic fan-out is capped at
        # k·(k−1)/2 per basket before any join input materializes.
        w_cap = Window.partitionBy("_bk").orderBy(
            F.md5(F.concat_ws("|", F.col("_bk").cast("string"),
                              F.col("_it").cast("string"))),
            F.col("_it"),
        )
        pair_src = (
            m.withColumn("_rn", F.row_number().over(w_cap))
            .filter(F.col("_rn") <= int(max_basket_size))
            .drop("_rn")
        )
    n_baskets = F.broadcast(
        m.agg(F.count_distinct(F.col("_bk")).alias("_n"))
    )
    item_counts = m.groupBy("_it").agg(F.count(F.lit(1)).alias("_c"))
    pairs = (
        pair_src.alias("x")
        .join(
            pair_src.alias("y"),
            on=[
                F.col("x._bk") == F.col("y._bk"),
                F.col("x._it") < F.col("y._it"),
            ],
        )
        .select(F.col("x._it").alias("a"), F.col("y._it").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= int(min_count))
    )
    scored = (
        pairs.join(
            item_counts.select(
                F.col("_it").alias("a"), F.col("_c").alias("_ca")
            ),
            on="a",
        )
        .join(
            item_counts.select(
                F.col("_it").alias("b"), F.col("_c").alias("_cb")
            ),
            on="b",
        )
        .crossJoin(n_baskets)
        .select(
            "a",
            "b",
            "n_pair",
            F.round(F.col("n_pair") / F.col("_n"), 4).alias("support"),
            F.round(F.col("n_pair") / F.col("_ca"), 4).alias("conf_ab"),
            F.round(F.col("n_pair") / F.col("_cb"), 4).alias("conf_ba"),
            F.round(
                (F.col("n_pair") * F.col("_n"))
                / (F.col("_ca") * F.col("_cb")),
                4,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(int(top))


def skipgram_pairs(
    docs: DataFrame,
    text_col: str,
    window: int = 4,
    min_count: int = 5,
    top: int = 50,
) -> DataFrame:
    """Windowed skip-gram collocations — ``pmi_bigrams`` generalized
    from adjacency to a ±``window`` context (the word2vec counting
    kernel, and the phrase/topic-association census a 1-distance
    bigram misses):

        PMI(x, y) = ln( (c_xy / N_pairs) / ((c_x/N)·(c_y/N)) )

    over FORWARD pairs (t[i], t[i+d]), 1 ≤ d ≤ window (each unordered
    co-occurrence counted once, in document order — the symmetric
    census is this relation plus its mirror, a projection away).

    Topology: pair generation is ``window`` zip_with-over-slices
    explodes unioned in ONE flatten expression — never a positional
    self-join (which at 100 TB would shuffle token positions; this
    form is a pure projection over the scan). Everything downstream is
    the pmi_bigrams discipline: map-side-combinable counts, min-count
    filter BEFORE the unigram joins, totals as a broadcast 1-row
    aggregate, one ln of an exact rational, 4dp. ANSI-safe on short
    documents by the same greatest(size-d, 0) slice guard.

    Returns (w1, w2, dist_min, n_pair, pmi) ordered by
    (pmi DESC, w1, w2): ``dist_min`` is the smallest token distance at
    which the pair co-occurs (1 = also adjacent).
    """
    window = int(window)
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = docs.select(tokens(F.col(text_col)).alias("t"))
    per_d = ", ".join(
        "zip_with("
        f"slice(t, 1, greatest(size(t) - {d}, 0)), "
        f"slice(t, {d + 1}, greatest(size(t) - {d}, 0)), "
        f"(x, y) -> struct(x AS w1, y AS w2, {d} AS dist))"
        for d in range(1, window + 1)
    )
    pairs = toks.select(
        F.explode(F.expr(f"flatten(array({per_d}))")).alias("pg")
    ).select("pg.w1", "pg.w2", "pg.dist")
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(
            F.count(F.lit(1)).alias("n_pair"),
            F.min("dist").cast("int").alias("dist_min"),
        )
        .filter(F.col("n_pair") >= int(min_count))
    )
    unigrams = toks.select(F.explode(F.col("t")).alias("w"))
    return _pmi_scored(pairs, unigrams, pair_counts, ["dist_min"], top)
