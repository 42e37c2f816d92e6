"""Corpus-curation operators: mixture sampling, boilerplate removal,
quality-percentile filtering, pack materialization, unigram LM scoring.

Beyond-reference capabilities — the passes a pre-training data pipeline
runs between "raw dedup'd corpus" and "training shards":

* ``hash_mixture``   — deterministic per-group Bernoulli sampling by
  hash threshold ("keep 30% of src_a, 100% of src_b"), the mixture-
  weighting primitive. Pure projection: the keep decision is
  ``md5(id) < bound(rate)`` on 8-hex-digit strings, so the SAME rows
  are kept on every run, every partitioning, every engine — the
  property ``df.sample`` does not give you.
* ``remove_boilerplate_lines`` — drop lines occurring in more than
  ``max_df`` documents (nav bars, cookie banners, license footers) and
  rebuild each document's text. Topology: posexplode lines → per-line
  doc-frequency on a 64-bit line hash (map-side combinable) → equi-join
  back on the hash → groupBy(doc) rebuild. Three exchanges, all keyed;
  the df relation is vocabulary-sized, never corpus-sized.
* ``percentile_filter`` — keep rows at or above their group's p-th
  percentile of a score ("top half by quality, per language"). The
  per-group cut relation is groups-sized → broadcast back; one
  aggregation exchange. At 100 TB swap ``percentile`` for
  ``approx_percentile`` (sketch buffers) — same topology.
* ``materialize_packs`` — turn pack assignments (sampling.py) into the
  actual training sequences: per bin, concatenate document text in the
  same deterministic (md5(id), id) order the packer used. One exchange
  on the pack key; the heavy payload (text) moves exactly once.
* ``unigram_logprob`` — mean per-token unigram log-likelihood of each
  document under the corpus' own (add-alpha smoothed) unigram model —
  the cheap LM-quality proxy (a KenLM swap-in changes the model lookup,
  not the topology). Token relation joins its frequency on the token
  key; frequencies are vocabulary-sized (broadcast when they fit).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from m3d_engine_spark.functions.idents import qident


def nullsafe_stat_join(df: DataFrame, stats: DataFrame, keys) -> DataFrame:
    """Join per-group statistics back onto the rows with NULL-SAFE key
    equality. groupBy treats NULL as a real group and computes its
    stats, but a plain ``on=keys`` equi-join never matches NULL==NULL —
    every NULL-keyed row silently vanishes from the output (corpus
    loss, not an error). The stats side arrives renamed so the output
    keeps exactly the input's key columns."""
    keys = list(keys)
    st = stats
    for k in keys:
        st = st.withColumnRenamed(k, f"_gk_{k}")
    cond = None
    for k in keys:
        c = df[k].eqNullSafe(st[f"_gk_{k}"])
        cond = c if cond is None else (cond & c)
    return df.join(F.broadcast(st), on=cond).drop(*[f"_gk_{k}" for k in keys])


def keep_bound(rate: Column) -> Column:
    """8-hex-digit keep bound for ``hash_mixture``: lowercase hex of
    floor(rate · 2³²), clamped to ffffffff (rate ≥ 1 keeps everything
    via the explicit short-circuit, not the bound)."""
    n = F.floor(rate * F.lit(float(1 << 32))).cast("bigint")
    # clamp BOTH ends: a negative rate must keep nothing — unclamped,
    # conv() renders two's-complement hex ('ffffffffffffff85') and the
    # 8-char lpad truncation turns it into the keep-everything bound
    n = F.greatest(F.least(n, F.lit((1 << 32) - 1)), F.lit(0))
    return F.lower(F.lpad(F.conv(n.cast("string"), 10, 16), 8, "0"))


def hash_mixture(
    df: DataFrame,
    id_col: str,
    rate: Column,
    keep_col: str | None = None,
) -> DataFrame:
    """Deterministic Bernoulli(``rate``) subsample keyed on
    ``md5(id)`` — ``rate`` is a per-row Column (typically derived from
    a source/group column), so one pass materializes an arbitrary
    mixture recipe. Returns the kept rows (or, with ``keep_col``, all
    rows flagged). Zero exchanges."""
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    keep = (rate >= 1.0) | (h < keep_bound(rate))
    if keep_col is not None:
        return df.withColumn(keep_col, keep)
    return df.filter(keep)


def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int,
    out_col: str = "clean_text",
) -> DataFrame:
    """(id, ``out_col``, n_kept, n_dropped): each document's text with
    lines appearing in MORE than ``max_df`` distinct documents removed
    (exact doc-frequency, counted once per doc even when a doc repeats
    the line). Line identity is the exact line string, keyed through
    ``xxhash64`` so the df aggregation and join move 8-byte keys, not
    line text. Empty docs survive with empty ``out_col``."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode_outer(F.split(F.col(text_col), "\n")).alias(
            "_pos", "_line"
        ),
    ).withColumn("_lh", F.xxhash64("_line"))
    line_df = (
        lines.select(F.col(id_col), "_lh")
        .distinct()
        .groupBy("_lh")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    tagged = lines.join(line_df, on="_lh").withColumn(
        "_keep", F.col("_df") <= F.lit(int(max_df))
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.expr(
                    "transform(array_sort(collect_list(CASE WHEN _keep "
                    "THEN struct(_pos, _line) END)), s -> s._line)"
                ),
            ).alias(out_col),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0))
            .cast("int")
            .alias("n_kept"),
            F.sum(F.when(F.col("_keep"), 0).otherwise(1))
            .cast("int")
            .alias("n_dropped"),
        )
    )


def percentile_filter(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    p: float,
) -> DataFrame:
    """Rows whose ``score_col`` is ≥ their group's exact ``p``-th
    percentile (sort-interpolated, the ``percentile`` == DuckDB
    ``quantile_cont`` contract price_quantiles pins). Output = input +
    ``cut`` (the group's threshold)."""
    cuts = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({qident(score_col)}, {float(p)})").alias("cut")
    )
    return nullsafe_stat_join(df, cuts, group_cols).filter(
        F.col(score_col) >= F.col("cut")
    )


def materialize_packs(
    packed: DataFrame,
    pack_cols: Sequence[str],
    id_col: str,
    text_col: str,
    sep: str = "\n\n",
) -> DataFrame:
    """(pack_cols…, seq_text, n_docs, n_tokens_total): concatenate the
    documents of each pack in the packer's own deterministic
    (md5(id), id) order. ``packed`` is ``pack_sequences[_greedy]``
    output (carries ``n_tokens``); ``pack_cols`` is its pack key
    (e.g. ``["lang", "bin"]`` or ``["lang", "shard", "bin"]``)."""
    ordk = F.md5(F.col(id_col).cast("string"))
    return (
        packed.select(
            *pack_cols,
            F.struct(
                ordk.alias("o"),
                F.col(id_col).alias("i"),
                F.col(text_col).alias("t"),
            ).alias("_s"),
            F.col("n_tokens"),
        )
        .groupBy(*pack_cols)
        .agg(
            F.concat_ws(
                sep, F.expr("transform(array_sort(collect_list(_s)), s -> s.t)")
            ).alias("seq_text"),
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens_total"),
        )
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_tokens, avg_logprob): mean ln P(token) under the corpus'
    own add-``alpha`` unigram distribution — low scores flag
    out-of-distribution / garbled documents. N (total tokens) and V
    (vocabulary) ride along as a broadcast 1-row aggregate, so the plan
    stays lazy and nothing counts on the driver. 4dp rounding absorbs
    summation-order ulps (same contract as the cosine entries)."""
    from m3d_engine_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    freqs = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = F.broadcast(
        freqs.agg(
            F.sum("c").cast("double").alias("N"),
            F.count(F.lit(1)).cast("double").alias("V"),
        )
    )
    a = float(alpha)
    scored = (
        toks.join(freqs, on="w")
        .crossJoin(totals)
        .select(
            F.col(id_col),
            F.log((F.col("c") + F.lit(a)) / (F.col("N") + F.lit(a) * F.col("V"))).alias(
                "_lp"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("_lp"), 4).alias("avg_logprob"),
    )


def _bigram_transitions(docs: DataFrame, id_col: str, text_col: str):
    """(toks, bg): the tokenized relation and the guarded zip_with
    transition explode to (doc, w1, w2) rows (the short-doc-safe form
    from collocations.py) — shared by ``bigram_logprob`` and
    ``interpolated_logprob`` so the slice guard and struct field names
    have exactly one definition."""
    from m3d_engine_spark.functions.text import tokens

    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
    bg = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, greatest(size(t) - 1, 0)),"
                " slice(t, 2, greatest(size(t) - 1, 0)),"
                " (x, y) -> struct(x AS w1, y AS w2))"
            )
        ).alias("b"),
    ).select(F.col(id_col), "b.w1", "b.w2")
    return toks, bg


def bigram_logprob(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_bigrams, avg_logprob): mean ln P(wᵢ | wᵢ₋₁) under the
    corpus' own add-``alpha`` bigram model — the next step up from
    ``unigram_logprob`` toward a KenLM-grade fluency filter (a real
    n-gram LM swaps the count relations, not the topology).

        P(w₂ | w₁) = (c(w₁w₂) + α) / (c₁(w₁) + α·V)

    where c₁ counts w₁ as a bigram CONTEXT (positions 1..n−1, derived
    by summing pair counts — no second corpus pass) and V is the full
    unigram vocabulary. Documents with <2 tokens have no transitions
    and emit no row.

    Topology: one guarded zip_with explode to (doc, w1, w2) rows (the
    short-doc-safe form from collocations.py), pair counts and context
    counts are map-side-combinable aggs joined back on their keys
    (vocabulary-sized → broadcast when they fit), V is a broadcast
    1-row aggregate. 4dp rounding absorbs summation-order ulps.
    """
    toks, bg = _bigram_transitions(docs, id_col, text_col)
    pair_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx_counts = pair_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = F.broadcast(
        toks.select(F.explode("t").alias("w")).agg(
            F.count_distinct(F.col("w")).cast("double").alias("V")
        )
    )
    a = float(alpha)
    scored = (
        bg.join(pair_counts, on=["w1", "w2"])
        .join(ctx_counts, on="w1")
        .crossJoin(vocab)
        .select(
            F.col(id_col),
            F.log(
                (F.col("c12") + F.lit(a)) / (F.col("c1") + F.lit(a) * F.col("V"))
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("_lp"), 4).alias("avg_logprob"),
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
) -> DataFrame:
    """Cross-document exact paragraph deduplication (the C4 recipe:
    drop every repeated paragraph, corpus-wide, keeping only its FIRST
    occurrence in (doc id, position) order) and rebuild each document
    from its surviving paragraphs in original order. Returns
    (id, text, n_kept, n_total); documents whose every paragraph lost
    come back with empty text, not dropped rows.

    Topology: posexplode paragraphs → global winner per paragraph as a
    ``min_by`` on the 64-bit paragraph hash (map-side combinable, and
    the winner relation carries (hash, id, pos) — the paragraph TEXT is
    never shuffled for the election, unlike a groupBy(paragraph)) →
    co-partitioned equi-join back on the hash → groupBy(id) rebuild.
    A row_number window over the hash would be the same election but
    with a skew bomb: one viral boilerplate paragraph = one partition
    with 10⁹ rows; min_by partial-aggregates it inside each scan task.
    xxhash64 collisions can only DEMOTE a would-be winner (join still
    requires (id, pos) to match), at ~n²/2⁶⁴ odds — the standard
    engineering trade, documented here.
    """
    # F.split takes a Java REGEX: quote the separator so a metachar
    # sep ('|', '.', '+') splits literally — unquoted, '|' alternation
    # matches the empty string and shreds documents character-wise
    # while the array_join rebuild below inserts LITERAL separators.
    import re as _re

    pl = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep))
        ).alias("pos", "para"),
    ).withColumn("ph", F.xxhash64("para"))
    winners = pl.groupBy("ph").agg(
        F.min_by(
            F.struct(F.col(id_col).alias("wid"), F.col("pos").alias("wpos")),
            F.struct(F.col(id_col), F.col("pos")),
        ).alias("w")
    ).select(F.col("ph").alias("wph"), "w.wid", "w.wpos")
    kept = pl.join(
        winners,
        on=[
            pl["ph"] == winners["wph"],
            pl[id_col] == winners["wid"],
            pl["pos"] == winners["wpos"],
        ],
    ).select(pl[id_col], "pos", "para")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("para")))
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(
            F.split(F.col(text_col), __import__("re").escape(sep))
        ).cast("long").alias("n_total"),
    )
    return totals.join(rebuilt, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        F.col("n_total"),
    )


def curation_pipeline(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 20,
    min_distinct_ratio: float = 0.33,
    dedup_prefix: int = 8,
    split_weights: Sequence[float] = (0.8, 0.1, 0.1),
    scrub: bool = True,
    keep_text: bool = False,
) -> DataFrame:
    """End-to-end curation: quality gate → PII scrub → exact
    prefix-fingerprint dedup → train/val/test split — the whole
    raw-corpus-to-training-shards pass as ONE lazy plan.

    Stages (each individually oracled by its own entry; this operator
    pins their composition):

    1. gate: ≥ ``min_tokens`` whitespace tokens AND distinct-token
       ratio ≥ ``min_distinct_ratio`` (cheap fluency/repetition gate);
    2. scrub: emails → IPs → phones replaced by typed tokens, with
       per-pattern hit counts (functions/redact.py);
    3. dedup: md5 fingerprint of the first ``dedup_prefix`` tokens of
       the SCRUBBED text; only each fingerprint's minimum id survives
       (map-side-combinable min election keyed on the fingerprint —
       the paragraph_dedup topology, one agg + one keyed join);
    4. split: deterministic md5 train/val/test assignment
       (sampling.py::hash_split — pure projection).

    Returns (id, split, n_pii, fp) per surviving document. Everything
    before the dedup election is projection over the scan; the whole
    pipeline exchanges data exactly twice (election agg + join), both
    keyed on the 32-hex fingerprint — at 100 TB the text column rides
    only to the fingerprint projection, never through an exchange.

    ``scrub=False`` skips stage 2 (fingerprints over raw text,
    n_pii = 0). ``keep_text=True`` appends the surviving document's
    (scrubbed) ``text`` — the cleaned-corpus-table shape the
    CurationPipeline CLI algorithm writes; the text then rides the
    election join's exchange, which is the honest cost of
    materializing a corpus rather than a manifest.
    """
    from m3d_engine_spark.functions.redact import pii_scrub
    from m3d_engine_spark.functions.text import distinct_token_ratio, tokens
    from m3d_engine_spark.operators.sampling import hash_split

    t = tokens(F.col(text_col))
    # no rounding in the gate: the ratio is a small-integer division —
    # bit-identical across engines — and the threshold is a literal
    gated = docs.filter(
        (F.size(t) >= min_tokens)
        & (distinct_token_ratio(F.col(text_col)) >= min_distinct_ratio)
    )
    if scrub:
        scrubbed = pii_scrub(gated, id_col, text_col)
        n_pii = (
            F.col("n_emails") + F.col("n_ips") + F.col("n_phones")
        ).alias("n_pii")
        txt = F.col("scrubbed")
    else:
        scrubbed = gated.select(F.col(id_col), F.col(text_col))
        n_pii = F.lit(0).cast("int").alias("n_pii")
        txt = F.col(text_col)
    fp = F.md5(F.concat_ws(" ", F.slice(tokens(txt), 1, dedup_prefix)))
    carried = [txt.alias("text")] if keep_text else []
    with_fp = scrubbed.select(F.col(id_col), n_pii, fp.alias("fp"), *carried)
    winners = with_fp.groupBy("fp").agg(F.min(id_col).alias("_win"))
    survivors = (
        with_fp.join(winners, on="fp")
        .filter(F.col(id_col) == F.col("_win"))
        .drop("_win")
    )
    out_cols = [id_col, "split", "n_pii", "fp"] + (
        ["text"] if keep_text else []
    )
    return hash_split(survivors, id_col, list(split_weights)).select(*out_cols)


def ccnet_buckets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    score every document with the corpus' own unigram LM
    (``unigram_logprob``), then split EACH LANGUAGE into head / middle
    / tail terciles by score — the standard "keep the head, maybe the
    middle" quality-mixture prior to pre-training.

    The tercile cuts are EXACT-INTEGER rank arithmetic, not
    interpolated percentiles: scores quantize to a 1e-4 grid, a
    per-language score HISTOGRAM (distinct-scores-sized, tiny)
    cumulates descending, and the cut is the score of the ceil(n/3)-th
    ranked document. Interpolated percentile() here is a cross-engine
    ulp trap — with p=1/3 and n-1 divisible by 3, the interpolation
    fraction lands within an ulp of 1.0 and the >= comparison at the
    cut flips between engines (observed); integer ranks cannot.
    All docs sharing the cut score share its bucket (value cutoffs,
    as CCNet itself applies them).

    Topology: LM scoring (token explode → vocabulary-sized frequency
    join → per-doc mean) → histogram aggregation (one keyed exchange,
    distinct-scores-sized output) → window over the HISTOGRAM (tiny)
    → languages-sized cut relation broadcast back. No window over the
    corpus. Returns (id, lang, n_tokens, avg_logprob, bucket)."""
    # LEFT join from docs: a zero-token document produces no
    # unigram_logprob row (explode of an empty token array), and an
    # inner join would silently drop it from the output — it stays,
    # scores NULL, and lands in "tail" below (the worst bucket, where
    # an empty document belongs). Cuts are computed over scored docs
    # only (the LM is undefined on empty text).
    scored = docs.select(F.col(id_col), F.col(lang_col)).join(
        unigram_logprob(docs, id_col, text_col, alpha=alpha),
        on=id_col,
        how="left",
    )
    sc = F.round(F.col("avg_logprob") * 10000).cast("long")
    hist = (
        scored.select(F.col(lang_col), sc.alias("_sc"))
        .groupBy(lang_col, "_sc")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wdesc = (
        Window.partitionBy(lang_col)
        .orderBy(F.col("_sc").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(lang_col)
    ranked = hist.select(
        F.col(lang_col),
        F.col("_sc"),
        F.sum("_c").over(wdesc).alias("_cum"),
        F.sum("_c").over(wn).alias("_n"),
    )
    cuts = ranked.groupBy(lang_col).agg(
        # head cut: score of the ceil(n/3)-th doc (descending ranks)
        F.max(
            F.when(F.col("_cum") >= F.ceil(F.col("_n") / 3), F.col("_sc"))
        ).alias("_c2"),
        F.max(
            F.when(F.col("_cum") >= F.ceil(F.col("_n") * 2 / 3), F.col("_sc"))
        ).alias("_c1"),
    )
    return nullsafe_stat_join(scored, cuts, [lang_col]).select(
        id_col,
        lang_col,
        "n_tokens",
        "avg_logprob",
        F.when(sc >= F.col("_c2"), F.lit("head"))
        .when(sc >= F.col("_c1"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def temperature_mixture(
    docs: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Multinomial temperature sampling over sources (the XLM-R/mBERT
    recipe): target sampling probability q_g ∝ p_g^alpha flattens the
    source distribution, realized here as deterministic per-group keep
    rates r_g = (n_min/n_g)^(1−alpha) — the rarest group keeps
    everything, frequent groups downsample, and the kept set is a pure
    function of the data (md5-threshold Bernoulli via
    ``hash_mixture``).

    alpha=0.5 computes the rate with sqrt — correctly-rounded IEEE, so
    both engines derive bit-identical rates and keep bounds from the
    integer counts. Other alphas go through pow, whose last ulp is
    implementation-defined; a rate whose 2³²-scaled value lands within
    that ulp of an integer could flip one document's keep bit across
    engines (same class of caveat as the seeded-LSH sign decisions).

    Topology: one count aggregation to a groups-sized relation, the
    1-row n_min aggregate and the rates broadcast back, keep decision
    a pure projection — the corpus never exchanges. Returns the kept
    rows + (n_g, rate)."""
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_g"))
    nmin = F.broadcast(counts.agg(F.min("n_g").alias("_n_min")))
    frac = F.col("_n_min").cast("double") / F.col("n_g")
    if alpha == 0.5:
        rate = F.sqrt(frac)
    else:
        rate = F.pow(frac, F.lit(1.0 - float(alpha)))
    rates = counts.crossJoin(nmin).select(
        group_col, "n_g", rate.alias("_rate")
    )
    kept = hash_mixture(
        nullsafe_stat_join(docs, rates, [group_col]), id_col, F.col("_rate")
    )
    return kept.withColumn("rate", F.round(F.col("_rate"), 6)).drop("_rate")


def assemble_sequences(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    text_col: str,
    sep: str = " > ",
) -> DataFrame:
    """Order-preserving per-group text assembly — the step between
    "cleaned events/turns" and "training sequence" for multi-turn data
    (SFT conversations, session transcripts, clickstream contexts):
    concatenate each group's ``text_col`` values in ``order_cols``
    order into one string.

    The order survives distribution WITHOUT a sort-before-aggregate:
    ``collect_list`` gathers in arbitrary partition order, then
    ``array_sort`` over (order keys, text) structs restores the total
    order inside the aggregated value — struct comparison is
    lexicographic, so appending the text itself makes ties total and
    the output deterministic under any partitioning. (A global
    ``orderBy`` before the groupBy would cost a full sort exchange AND
    still not guarantee collect order across map tasks — this shape is
    both cheaper and actually correct.)

    ONE keyed exchange (the groupBy); partial aggregation ships each
    task's local lists. Memory: a group's turns must fit in one
    aggregation buffer — true for conversations/sessions by
    construction; cap pathological groups upstream (sessionize's gap
    splitting already bounds them). NULL texts are dropped by
    ``array_join`` — filter or coalesce upstream if they must be
    preserved.

    Returns group_cols + n_turns + ``transcript``.
    """
    order_structs = F.struct(
        *[F.col(c) for c in order_cols], F.col(text_col).alias("__seq_txt")
    )
    return (
        df.groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list(order_structs)).alias("_p"))
        .select(
            *group_cols,
            F.size(F.col("_p")).alias("n_turns"),
            F.array_join(
                F.expr("transform(_p, s -> s.__seq_txt)"), sep
            ).alias("transcript"),
        )
    )


# --------------------------------------------------------------------------
# CLI algorithm: the params-driven dispatch surface
# --------------------------------------------------------------------------

from m3d_engine_spark.operators.base import Algorithm, register  # noqa: E402


@register("CurationPipeline")
class CurationPipelineAlgorithm(Algorithm):
    """``curation_pipeline`` behind the reference's JSON-params dispatch
    (AlgorithmFactory.scala:66-83 pattern, like StreamingAppendLoad) —
    the whole raw-corpus → cleaned-training-corpus pass as one
    spark-submit-able job:

        python -m m3d_engine_spark CurationPipeline params.json

    Config keys:
      source_location (parquet dir) OR source_table
      id_column (default "doc_id"), text_column (default "text")
      min_tokens (default 20), min_distinct_ratio (default 0.33)
      scrub (bool, default true — PII redaction on/off)
      dedup_prefix (default 8), split_weights (default [0.8, 0.1, 0.1])
      target_location OR target_table (+ target_partitions,
      output_files_num, load_mode — the full write_output surface;
      defaults to partitioning the cleaned corpus by ``split``)

    The written table carries (id, split, n_pii, fp, text) — the
    cleaned corpus itself (keep_text=True), not just a manifest.
    """

    def read(self) -> list[DataFrame]:
        if self.params.has("source_table"):
            return [self.spark.table(self.params.get_string("source_table"))]
        return [
            self.spark.read.parquet(self.params.get_string("source_location"))
        ]

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        p = self.params
        return [
            curation_pipeline(
                dfs[0],
                p.get_optional("id_column", "doc_id"),
                p.get_optional("text_column", "text"),
                min_tokens=int(p.get_optional("min_tokens", 20)),
                min_distinct_ratio=float(
                    p.get_optional("min_distinct_ratio", 0.33)
                ),
                dedup_prefix=int(p.get_optional("dedup_prefix", 8)),
                split_weights=[
                    float(w)
                    for w in p.get_optional("split_weights", [0.8, 0.1, 0.1])
                ],
                scrub=bool(p.get_optional("scrub", True)),
                keep_text=True,
            )
        ]

    def write(self, dfs: list[DataFrame]) -> None:
        from m3d_engine_spark.sources.writers import write_output

        if not self.params.has("target_partitions"):
            # default: a corpus readers consume split-by-split prunes
            # on the split dir
            self.params.params.setdefault("target_partitions", ["split"])
        write_output(self.spark, dfs[0], self.params)


def interpolated_logprob(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
    lambda_pct: int = 70,
) -> DataFrame:
    """(id, n_bigrams, avg_logprob): mean ln of the Jelinek–Mercer
    interpolated transition probability

        P(w₂ | w₁) = λ·P_bigram(w₂ | w₁) + (1−λ)·P_unigram(w₂)

    — the standard backoff fix for the add-α bigram model's blind spot
    (an UNSEEN transition between two common words scores as badly as
    one between two typos; the unigram floor separates them), and the
    closest cheap proxy to a real KenLM before swapping in trained
    counts. λ = ``lambda_pct``/100 enters as one engine-portable
    double.

    Topology is ``bigram_logprob``'s with ONE extra vocabulary-sized
    join (the w₂ unigram count): transition explode → pair/context/
    unigram count joins → one ln per transition → per-doc mean, 4dp
    (summation-order ulps absorbed, same contract as every LM entry).
    Documents with <2 tokens emit no row.
    """
    toks, bg = _bigram_transitions(docs, id_col, text_col)
    pair_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx_counts = pair_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    unigrams = toks.select(F.explode("t").alias("w"))
    uni_counts = unigrams.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    totals = F.broadcast(
        unigrams.agg(
            F.count(F.lit(1)).cast("double").alias("N"),
            F.count_distinct(F.col("w")).cast("double").alias("V"),
        )
    )
    a = float(alpha)
    lam = F.lit(int(lambda_pct)) / F.lit(100.0)
    com = F.lit(100 - int(lambda_pct)) / F.lit(100.0)
    p_bi = (F.col("c12") + F.lit(a)) / (F.col("c1") + F.lit(a) * F.col("V"))
    p_uni = (F.col("cw") + F.lit(a)) / (F.col("N") + F.lit(a) * F.col("V"))
    scored = (
        bg.join(pair_counts, on=["w1", "w2"])
        .join(ctx_counts, on="w1")
        .join(uni_counts.select(F.col("w").alias("w2"), "cw"), on="w2")
        .crossJoin(totals)
        .select(
            F.col(id_col),
            F.log(lam * p_bi + com * p_uni).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("_lp"), 4).alias("avg_logprob"),
    )


def k_anonymity_suppress(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    mask: str = "*",
) -> DataFrame:
    """k-anonymity by full-class suppression: the census of equivalence
    classes over the quasi-identifier columns, with every class smaller
    than ``k`` collapsed into ONE masked class.

    The release-gate sibling of ``scrub_pii`` (this file): scrub removes
    direct identifiers from text, this guards against re-identification
    by quasi-identifier combination — a class of fewer than ``k`` rows
    means those rows are ``1/n``-identifiable by (quasi...) alone, so
    their quasi values are replaced with ``mask`` and the rows pool into
    a single anonymous class. Returns one row per surviving class:
    the quasi columns (as strings, masked for the pooled class),
    ``n`` (class size) and ``suppressed`` (1 on the pooled class).

    Key on (quasi..., ``suppressed``), never on the quasi tuple alone:
    a GENUINE class whose quasi values equal the mask literal (e.g. a
    real ``'*'`` value) is distinguishable from the pooled class only
    by the flag — pick a ``mask`` outside the columns' value domain if
    downstream consumers cannot carry it.

    Scale: one map-side-combinable count aggregate on the quasi key —
    the exchange carries one row per class, not per input row; the
    under-k classes are re-aggregated to a single row, a second exchange
    over class-count rows only (≤ the first's output, typically tiny).
    No joins, no windows; at 100 TB this is a plain census.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    quasi = list(quasi_cols)
    counts = df.groupBy(*[F.col(c).cast("string").alias(c) for c in quasi]).agg(
        F.count(F.lit(1)).alias("n")
    )
    ok = counts.filter(F.col("n") >= k).select(
        *quasi, "n", F.lit(0).cast("int").alias("suppressed")
    )
    pooled = (
        counts.filter(F.col("n") < k)
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n").isNotNull())  # no under-k classes -> no row
        .select(
            *[F.lit(mask).alias(c) for c in quasi],
            "n",
            F.lit(1).cast("int").alias("suppressed"),
        )
    )
    return ok.unionByName(pooled)
