"""Distributed BPE (byte-pair-encoding) merge learning.

Beyond-reference capability — the tokenizer-training pass of an LLM
data pipeline (the census/fertility monitors in ``functions/text.py``
measure an EXISTING tokenizer; this learns one). The classic
algorithm (Sennrich et al. 2016): repeatedly merge the most frequent
adjacent symbol pair. The distributed shape mirrors how the
single-node reference trainers stay fast, translated to Spark:

* the corpus is scanned ONCE, into the word vocabulary ``(word, n)``
  — every later round iterates over this vocabulary-sized relation
  (10⁵-10⁶ rows no matter how big the corpus), never the corpus.
* one merge round = ONE map-side-combinable pair-count aggregate over
  the vocabulary + a 1-row argmax collect (count DESC, pair ASC — a
  total order, so training is deterministic) + a JVM fold applying
  the merge to each word's symbol array. No Python in any per-row
  path.
* the symbolized vocabulary is ``localCheckpoint``-ed each round —
  the lineage would otherwise double per round (the plan-blowup
  gotcha of every iterative operator in this engine).

At 100 TB the corpus→vocabulary census is the only big job (one
exchange on the word hash); training cost is rounds × vocabulary,
independent of corpus size — which is exactly why the vocabulary
iteration discipline matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m3d_engine_spark.functions.text import tokens


def word_vocabulary(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → ``(word, n)`` occurrence census; the one corpus-sized
    job of BPE training (one exchange, map-side combined)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _to_symbols(col):
    """word → array of single-character symbols (codepoint split)."""
    return F.expr(
        f"transform(sequence(1, length({col})), i -> substring({col}, i, 1))"
    )


def pair_census(vocab_syms: DataFrame) -> DataFrame:
    """Adjacent-pair counts over a symbolized vocabulary
    ``(syms array<string>, n)``: one generator fan-out + one
    aggregate. Pairs are weighted by word occurrences ``n``."""
    pairs = vocab_syms.filter(F.size("syms") >= 2).select(
        F.col("n"),
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("n").alias("cnt"))


def _apply_merge(syms_col, a: str, b: str):
    """Left-to-right fold replacing every adjacent (a, b) with a+b —
    the standard greedy merge application. ``F.get`` (0-based, null
    out of bounds) keeps the empty-accumulator probe ANSI-safe."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, lb))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame, text_col: str, num_merges: int, min_count: int = 1
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list ``[(a, b), ...]``. Deterministic: the argmax
    tiebreak is (count DESC, a ASC, b ASC). Stops early when no pair
    reaches ``min_count``."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    vocab = (
        word_vocabulary(df, text_col)
        .select(_to_symbols("word").alias("syms"), "n")
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        top = (
            pair_census(vocab)
            .filter(F.col("cnt") >= int(min_count))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0].a, top[0].b
        merges.append((a, b))
        vocab = vocab.select(
            _apply_merge(F.col("syms"), a, b).alias("syms"), "n"
        ).localCheckpoint()
    return merges


def bpe_segment(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize the corpus with a learned merge list: each word is
    char-split then the merges apply IN TRAINING ORDER (the BPE
    application rule). Returns ``(id_col, word, pieces)`` one row per
    word occurrence — feed it to a census for fertility audits.

    Scale: a pure projection chain (one fold per merge) over the
    exploded word stream — zero exchanges beyond the explode's
    narrow dependency; apply it to the distinct-word relation and
    join back when the merge list is long.
    """
    out = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    ).withColumn("pieces", _to_symbols("word"))
    for a, b in merges:
        out = out.withColumn("pieces", _apply_merge(F.col("pieces"), a, b))
    return out
