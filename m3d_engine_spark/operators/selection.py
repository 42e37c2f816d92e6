"""DSIR-style data selection: hashed n-gram importance weights +
deterministic Gumbel top-k resampling.

Beyond-reference capability — Data Selection with Importance Resampling
(Xie et al., NeurIPS 2023) is the standard recipe for "pick raw-corpus
documents that look like the target domain": estimate bag-of-hashed-
unigram distributions for the target slice and the raw corpus, weight
every document by the log-likelihood ratio of its tokens under the two,
then resample proportionally to the weights.

Topology (all JVM-side, no UDFs):

    explode tokens → bucket = md5-hash(token) mod B    [narrow]
    → (doc, bucket) counts                             [1 shuffle: doc+bucket]
    → raw bucket totals    (B rows)                    [1 shuffle: bucket]
    → target bucket totals (B rows)                    [1 shuffle: bucket]
    → per-bucket log-ratio table, BROADCAST            [B rows ≪ corpus]
    → join doc-bucket counts × ratio, sum per doc      [map-side combine]
    → Gumbel top-n                                     [TakeOrderedAndProject]

At 100 TB the two distribution relations stay B rows (B = a few
thousand) no matter the corpus size — they are classic broadcast dims.
The only corpus-sized exchanges are the two keyed aggregations; the
final top-n is a per-partition limit + single-reduce ordered take, not
a global sort.

Engine-exact determinism: the per-bucket log-ratio is rounded to a
1e-6 grid and scaled to an integer, so the per-document sum
Σ c_b · r_b is exact 64-bit integer arithmetic — aggregation order
(and engine) cannot change it. The resampling "randomness" is
md5(doc_id)-derived, so the selected set is a pure function of the
data: Gumbel key = log_w + (−ln(−ln u)), the textbook Gumbel-max
reformulation of sampling ∝ exp(log_w) without replacement.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from m3d_engine_spark.functions.text import md5_uint32, tokens

RATIO_SCALE = 1_000_000


def _bucket(col: Column, n_buckets: int) -> Column:
    """md5-derived bucket in [0, n_buckets) — portable across engines
    (DuckDB: CAST('0x' || substr(md5(t),1,8) AS BIGINT) % B)."""
    return md5_uint32(col) % n_buckets


def dsir_log_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """(id_col, log_w): per-document importance weight
    log p_target(doc)/p_raw(doc) under add-``alpha`` smoothed
    hashed-unigram models. ``target_pred`` selects the target slice
    (e.g. ``F.col("lang") == "en"``) from the same relation — the
    usual DSIR setup where the target is a trusted subset.

    log_w is exact: per-bucket ratios are fixed-point (1e-6) and the
    document sum is integer arithmetic; the returned column is the
    integer sum / 1e6 rounded at 4dp."""
    toks = docs.select(
        F.col(id_col),
        target_pred.alias("_is_target"),
        F.explode(tokens(F.col(text_col))).alias("_tok"),
    ).select(
        id_col, "_is_target", _bucket(F.col("_tok"), n_buckets).alias("_b")
    )
    doc_buckets = toks.groupBy(id_col, "_b").agg(
        F.count(F.lit(1)).alias("_c"),
        # constant within a doc; first() avoids re-joining docs
        F.first("_is_target").alias("_is_target"),
    )
    # raw/target totals derive from doc_buckets, NOT from a fresh pass
    # over toks: the expensive tokenize+hash+aggregate subtree is then
    # IDENTICAL in all three consumers, so AQE's exchange reuse
    # evaluates it once (re-deriving from toks would tokenize the
    # corpus three times).
    raw = doc_buckets.groupBy("_b").agg(F.sum("_c").alias("_rc"))
    tgt = (
        doc_buckets.filter(F.col("_is_target"))
        .groupBy("_b")
        .agg(F.sum("_c").alias("_tc"))
    )
    totals = raw.agg(
        F.sum("_rc").alias("_rtot"),
    ).crossJoin(
        tgt.agg(F.sum("_tc").alias("_ttot"))
    )
    # Empty target slice (predicate matched nothing) would make every
    # ratio NULL and every log_w NULL — and gumbel_resample downstream
    # would then "select" the first n ids by tie-break: deterministic
    # garbage. Fail loudly instead, WITHOUT an extra corpus pass: the
    # assert_true rides the 1-row totals projection (folded into the
    # consumed _ttot expression so column pruning cannot drop it).
    totals = totals.select(
        "_rtot",
        F.when(
            F.assert_true(
                F.coalesce(F.col("_ttot"), F.lit(0)) > 0,
                F.lit(
                    "dsir_log_weights: target_pred selected no tokens "
                    "(empty target slice) — check the predicate"
                ),
            ).isNull(),
            F.col("_ttot"),
        ).alias("_ttot"),
    )
    # B-row ratio table; missing target buckets smooth to alpha mass.
    ratios = (
        raw.join(tgt, on="_b", how="left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("_tc"), F.lit(0)) + F.lit(alpha))
                        / (F.col("_ttot") + F.lit(alpha * n_buckets))
                    )
                    - F.log(
                        (F.col("_rc") + F.lit(alpha))
                        / (F.col("_rtot") + F.lit(alpha * n_buckets))
                    )
                )
                * RATIO_SCALE
            )
            .cast("long")
            .alias("_r"),
        )
    )
    # 4dp round done in exact integer arithmetic (half away from zero on
    # the 1e-6-scaled sum): round(_wsum/1e6, 4) as a double division is
    # a cross-engine boundary hazard — the two engines' round() disagree
    # on doubles that are exact 5e-5 multiples.
    wsum = F.col("_wsum")
    lw4 = (
        F.when(wsum < 0, F.lit(-1)).otherwise(F.lit(1))
        * F.floor((F.abs(wsum) + 50) / 100).cast("long")
    )
    return (
        doc_buckets.join(F.broadcast(ratios), on="_b")
        .groupBy(id_col)
        .agg(F.sum(F.col("_c") * F.col("_r")).alias("_wsum"))
        .select(
            id_col,
            (lw4 / F.lit(10000.0)).alias("log_w"),
        )
    )


def gumbel_resample(
    weights: DataFrame,
    id_col: str,
    n: int,
    weight_col: str = "log_w",
) -> DataFrame:
    """Deterministic Gumbel top-``n``: key = log_w − ln(−ln u) with
    u = (md5(id)[0:8] + 0.5) / 2³², take the n largest keys. This is
    sampling-without-replacement proportional to exp(log_w)
    (Gumbel-max trick) with data-derived pseudo-randomness, so both
    engines select the identical set. Returns (id_col, log_w, key)."""
    u = (
        md5_uint32(F.col(id_col).cast("string")).cast("double") + 0.5
    ) / F.lit(float(1 << 32))
    keyed = weights.select(
        id_col,
        weight_col,
        F.round(F.col(weight_col) - F.log(-F.log(u)), 4).alias("sel_key"),
    )
    return keyed.orderBy(F.col("sel_key").desc(), F.col(id_col).asc()).limit(n)


def budget_select(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    order_col,
    token_count_col,
    budget: int,
    descending: bool = True,
) -> DataFrame:
    """Token-budget-capped selection — the "give me ~N tokens per
    language, best first" curation cut: within each group, rows are
    taken in ``order_col`` order (DESC by default: best quality /
    longest first; ``id_col`` breaks ties) until the group's
    cumulative ``token_count_col`` reaches ``budget``.

    The cut keeps every row whose PRECEDING cumulative total is below
    the budget, so a group may overshoot by exactly its one straddling
    document (the same window-expressible relaxation as
    ``pack_sequences`` — a close-on-overflow cut is a sequential
    recurrence, and the overshoot is bounded by one document, which is
    noise at corpus budgets). The ordering signal is pluggable — any
    deterministic Column (quality score, md5 priority, length).

    ONE exchange: the per-group cumulative-sum window; the budget
    filter is a post-window projection. Unlike top-n windows this
    cannot WindowGroupLimit (the cut depends on the running SUM, not
    the rank), so the exchange carries each group in full — cap
    pathological group sizes upstream if groups exceed task memory.

    Output = input + ``n_tokens`` + ``cum_tokens`` (inclusive).
    """
    # If df already carries n_tokens (e.g. chunk_documents or a prior
    # packing pass feeding back in — the documented precomputed-column
    # usage), withColumn REPLACES it: a blind select("*", alias) would
    # duplicate the name and every downstream reference would throw
    # AMBIGUOUS_REFERENCE.
    if "n_tokens" in df.columns:
        base = df.withColumn("n_tokens", token_count_col.cast("long"))
    else:
        base = df.select(
            "*", token_count_col.cast("long").alias("n_tokens")
        )
    ordering = (
        F.col("_ord").desc() if descending else F.col("_ord").asc()
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(ordering, F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("_ord", order_col)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < int(budget))
        .drop("_ord")
    )
