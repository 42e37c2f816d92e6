"""Model-based quality classification: logistic scoring over JVM
features.

Beyond-reference capability — the "quality classifier" stage of a
pre-training pipeline (the fastText-classifier slot in the
CCNet/RefinedWeb/FineWeb recipes), reduced to its Spark-shaped
essence: a linear model over cheap per-document features, applied as a
ZERO-EXCHANGE projection. The lesson this operator encodes is that
model INFERENCE over 100 TB is a map-side concern: weights are a
constant (or a broadcast relation when they come from a training job),
features are JVM expressions, and the sigmoid is one `exp` — nothing
here shuffles, so classification cost is exactly one scan.

The default weights are hand-set heuristics standing in for trained
coefficients (this container has no training stack); swapping in real
coefficients — from a logistic regression trained anywhere — changes
ONE dict, not the topology. Features (all from
``functions/text.py``, shared with ``text_stats``):

    log_tokens     ln(1 + n_tokens)      more text → more evidence
    distinct_ratio lexical diversity     boilerplate ↓
    stop_ratio     stopword fraction     natural prose ↑
    punct_ratio    punctuation fraction  markup/garbage ↓
    mean_tok_len   mean token length     code/URLs push this up

Determinism: features are exact-integer-derived doubles; the linear
term is one fixed-order expression; score = sigmoid rounded to 4dp
(the ln/exp libm contract every LM-scoring entry already uses).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m3d_engine_spark.functions.text import (
    distinct_token_ratio,
    mean_token_length,
    punctuation_ratio,
    stopword_ratio,
    token_count,
)

DEFAULT_WEIGHTS: dict[str, float] = {
    "log_tokens": 0.6,
    "distinct_ratio": 2.0,
    "stop_ratio": 1.5,
    "punct_ratio": -3.0,
    "mean_tok_len": -0.1,
}
DEFAULT_BIAS = -3.0


def score_quality(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    weights: Mapping[str, float] | None = None,
    bias: float = DEFAULT_BIAS,
    cut: float = 0.5,
) -> DataFrame:
    """(id, n_tokens, score, label): logistic quality score in (0, 1)
    and the 0/1 keep decision at ``cut``. Pure projection — compose
    with a filter for the gate form."""
    w = dict(DEFAULT_WEIGHTS)
    if weights:
        unknown = set(weights) - set(w)
        if unknown:
            raise ValueError(f"unknown feature weights: {sorted(unknown)}")
        w.update(weights)
    text = F.col(text_col)
    feats = {
        "log_tokens": F.log(F.lit(1.0) + token_count(text)),
        "distinct_ratio": distinct_token_ratio(text),
        "stop_ratio": stopword_ratio(text),
        "punct_ratio": punctuation_ratio(text),
        "mean_tok_len": mean_token_length(text),
    }
    # fixed accumulation order = dict order above (engine-stable)
    z = F.lit(float(bias))
    for name, col in feats.items():
        z = z + F.lit(float(w[name])) * col
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
    return docs.select(
        F.col(id_col),
        token_count(text).alias("n_tokens"),
        score.alias("score"),
        (score >= F.lit(float(cut))).cast("int").alias("label"),
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a probabilistic classifier — the
    measured answer to "can I threshold this score at 0.7 and trust
    it": bucket predictions into ``bins`` equal-width score bins and
    report, per bin, the prediction count, the mean predicted score,
    the observed positive rate of ``label_col`` (0/1 reference
    labels), and the gap. A calibrated classifier tracks the diagonal;
    the per-bin |gap| is the ECE integrand. Scores ≥ 1.0 clamp into
    the top bin.

    Determinism: bin assignment is floor(score·bins) on the already-
    4dp-rounded score (never a float boundary within an ulp of a bin
    edge); the mean score is an EXACT integer sum of the 1e-4-lattice
    scores divided once (no float accumulation order); rates are
    single IEEE divisions of exact counts. Topology: ONE map-side
    combinable aggregate on the bin key — bins-sized output, nothing
    else moves. Returns (bin, lo, hi, n, mean_score, obs_rate, gap).
    """
    b = int(bins)
    s = F.col(score_col)
    bin_ = F.least(F.floor(s * b).cast("int"), F.lit(b - 1)).alias("bin")
    agg = (
        scored.select(
            bin_,
            F.round(s * 10000).cast("long").alias("_s4"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_s4").alias("_ss"),
            F.sum("_y").alias("_pos"),
        )
    )
    mean_score = F.round(F.col("_ss") / (F.col("n") * F.lit(10000.0)), 6)
    obs = F.round(F.col("_pos") / F.col("n"), 6)
    return agg.select(
        "bin",
        F.round(F.col("bin") / F.lit(float(b)), 4).alias("lo"),
        F.round((F.col("bin") + 1) / F.lit(float(b)), 4).alias("hi"),
        "n",
        mean_score.alias("mean_score"),
        obs.alias("obs_rate"),
        F.round(
            F.round(F.col("_pos") / F.col("n"), 6)
            - F.round(F.col("_ss") / (F.col("n") * F.lit(10000.0)), 6),
            6,
        ).alias("gap"),
    )
