"""Lexical retrieval: BM25 top-k scoring of a query set against the
corpus.

Beyond-reference capability — the sparse-retrieval half of a RAG /
data-curation stack ("find the corpus documents that answer / leak /
match this probe set"), and the classic quality re-ranker next to the
embedding ANN tier in ``operators/similarity.py``.

Scoring is Lucene-flavored Okapi BM25:

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(q, d) = Σ_{t ∈ q ∩ d}  idf(t) · tf · (k1 + 1)
                                 / (tf + k1·(1 − b + b·dl/avgdl))

Topology (all JVM-side, no UDFs, nothing quadratic):

    explode corpus tokens → postings tf per (doc, term)  [1 shuffle: doc+term]
    → df per term (count of docs)                        [1 shuffle: term]
    → (N, avgdl) as a broadcast 1-row aggregate          [no driver action]
    → postings × query terms equi-join on term           [broadcast: queries]
    → score sum per (query, doc)                         [1 shuffle: qid+doc]
    → top-k per query                                    [WindowGroupLimit]

The scale-relevant property is WHAT each exchange carries: postings and
df rows are (hash-sized key, two ints) — document text never moves past
the first projection. The query-term relation is query-set-sized, so it
broadcasts; the posting join therefore never shuffles the corpus a
second time, and the score aggregation's key space is bounded by
|queries| × (docs sharing a query term), not the corpus. Top-k per
query is a row_number window → WindowGroupLimit keeps k rows per query
per task before the final exchange. At 100 TB the df relation is
vocabulary-sized and the postings relation is the one big intermediate
— exactly the inverted-index shape a search engine would build once at
write time; this operator is the query-time plan over it.

Determinism: counts and lengths are exact integers; the score is one
double expression summed per (query, doc) and rounded to 4dp — the
same absorb-the-summation-order-ulps contract as the cosine and
logprob entries; ranking orders by (score DESC, doc ASC) — total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from m3d_engine_spark.functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` corpus documents per query by BM25.

    Returns (query_id_col, id_col, rank, score); queries whose terms
    miss the corpus entirely yield no rows (a scorer, not an outer
    join). Query terms are DE-DUPLICATED per query (standard for short
    probes: repeating a word in the query does not double its weight).
    """
    d = docs.select(F.col(id_col).alias("_doc"), tokens(F.col(text_col)).alias("_tk"))
    postings = (
        d.select("_doc", F.size("_tk").alias("_dl"), F.explode("_tk").alias("term"))
        .groupBy("_doc", "_dl", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfs = postings.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    # Exact-integer corpus stats: carrying avgdl as a float would let a
    # summation-order ulp shift EVERY score. The inputs (dl, n_docs,
    # total_tokens) stay exact longs; the b·dl·n/tot term is evaluated
    # LEFT-ASSOCIATIVE as ((b·dl)·n)/tot — three correctly-rounded
    # double steps from exact operands, deterministic because the
    # association is fixed. Any engine twin must use the SAME
    # association (the DuckDB oracle writes 0.75 * dl * n / tot
    # verbatim); re-associating can flip a 4dp boundary.
    stats = F.broadcast(
        d.agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(F.size("_tk")).cast("long").alias("_tot"),
        )
    )
    qterms = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.explode(tokens(F.col(query_text_col))).alias("term"),
        ).distinct()
    )
    k1_, b_ = float(k1), float(b)
    scored = (
        postings.join(qterms, on="term")
        .join(dfs, on="term")
        .crossJoin(stats)
        .select(
            "_qid",
            "_doc",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("_df") + F.lit(0.5))
                    / (F.col("_df") + F.lit(0.5))
                )
                * (F.col("_tf") * F.lit(k1_ + 1.0))
                / (
                    F.col("_tf")
                    + F.lit(k1_)
                    * (
                        F.lit(1.0 - b_)
                        + F.lit(b_) * F.col("_dl") * F.col("_n") / F.col("_tot")
                    )
                )
            ).alias("_s"),
        )
        .groupBy("_qid", "_doc")
        .agg(F.round(F.sum("_s"), 4).alias("score"))
    )
    w = Window.partitionBy("_qid").orderBy(F.col("score").desc(), F.col("_doc").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_doc").alias(id_col),
            "rank",
            "score",
        )
    )


def rrf_fusion(
    runs: list[DataFrame],
    query_col: str,
    id_col: str,
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
    lattice: int = 10**9,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval runs — the standard
    hybrid-search combiner (lexical BM25 + embedding ANN, or any mix):
    ``rrf(d) = Σ_runs 1/(c + rank_run(d))``, documents missing from a
    run contribute nothing, output re-ranked by the fused score.

    RRF is rank-only (score scales never have to be calibrated across
    runs, which is why it wins in practice), so the fused score is kept
    EXACT on an integer lattice: each term is ``lattice div (c+rank)``
    (integer division, engine-identical), and the sum of longs is
    order-independent — no float summation anywhere. The returned
    ``rrf`` column is that lattice value (divide by ``lattice`` for the
    textbook score; ordering is identical).

    Scale: every input run is already top-k-per-query bounded, so the
    union carries Σ|runs|·k·queries rows; ONE aggregate on
    (query, doc) and a WindowGroupLimit-bounded rank window — the
    fusion costs less than any single run that feeds it.
    """
    if not runs:
        raise ValueError("rrf_fusion needs at least one run")
    tagged = [
        r.select(
            F.col(query_col).alias("_q"),
            F.col(id_col).alias("_d"),
            F.col(rank_col).cast("long").alias("_r"),
        )
        for r in runs
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    fused = u.groupBy("_q", "_d").agg(
        F.sum(F.expr(f"{int(lattice)} div ({int(c)} + _r)")).alias("rrf")
    )
    w = Window.partitionBy("_q").orderBy(F.col("rrf").desc(), F.col("_d").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col("_q").alias(query_col),
            F.col("_d").alias(id_col),
            "rank",
            "rrf",
        )
    )


# --------------------------------------------------------------------------
# CLI algorithm: params-driven dispatch (the CurationPipeline pattern)
# --------------------------------------------------------------------------

from m3d_engine_spark.operators.base import Algorithm, register  # noqa: E402


@register("BM25Retrieval")
class BM25RetrievalAlgorithm(Algorithm):
    """``bm25_topk`` behind the JSON-params dispatch — batch lexical
    retrieval as one spark-submit-able job (the offline eval / mining
    shape: score a fixed query set against a corpus snapshot, write
    the ranked run):

        python -m m3d_engine_spark BM25Retrieval params.json

    Config keys:
      corpus_location OR corpus_table (+ id_column "doc_id",
      text_column "text")
      queries_location OR queries_table (+ query_id_column "query_id",
      query_text_column "query_text")
      k (5), k1 (1.2), b (0.75)
      target_location OR target_table (+ the write_output surface)
    """

    def read(self) -> list[DataFrame]:
        p = self.params

        def load(kind: str) -> DataFrame:
            if p.has(f"{kind}_table"):
                return self.spark.table(p.get_string(f"{kind}_table"))
            return self.spark.read.parquet(p.get_string(f"{kind}_location"))

        return [load("corpus"), load("queries")]

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        p = self.params
        return [
            bm25_topk(
                dfs[0],
                p.get_optional("id_column", "doc_id"),
                p.get_optional("text_column", "text"),
                dfs[1],
                p.get_optional("query_id_column", "query_id"),
                p.get_optional("query_text_column", "query_text"),
                k=int(p.get_optional("k", 5)),
                k1=float(p.get_optional("k1", 1.2)),
                b=float(p.get_optional("b", 0.75)),
            )
        ]

    def write(self, dfs: list[DataFrame]) -> None:
        from m3d_engine_spark.sources.writers import write_output

        write_output(self.spark, dfs[0], self.params)


def phrase_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
) -> DataFrame:
    """Exact phrase retrieval over a positional inverted index: every
    occurrence of the (whitespace-tokenized) ``phrase`` as CONSECUTIVE
    tokens, returned as ``(id_col, start_pos)`` (0-based). The
    positional sibling of ``bm25_topk``'s bag-of-words scoring — what
    "find this exact quote in 10⁹ documents" needs, where a full-text
    substring scan would read every byte of the corpus.

    Scale: the postings relation ``(doc, pos, term)`` is one generator
    fan-out; each phrase term beyond the first adds ONE equi-join on
    (doc, adjusted position) between term-filtered slices — the term
    filters are pushed to the scan side, so join inputs are
    posting-list-sized (df(term) rows), never corpus-sized. Join
    count = phrase length − 1, the standard positional-index plan.
    """
    terms = phrase.strip().split()
    if not terms:
        raise ValueError("phrase must contain at least one token")
    postings = docs.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_term"),
    )
    out = postings.filter(F.col("_term") == terms[0]).select(
        "_doc", F.col("_pos").alias("_start")
    )
    for j, t in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("_term") == t).select(
            F.col("_doc").alias("_doc2"),
            (F.col("_pos") - F.lit(j)).alias("_start2"),
        )
        out = out.join(
            nxt,
            (F.col("_doc") == F.col("_doc2"))
            & (F.col("_start") == F.col("_start2")),
            "inner",
        ).select("_doc", "_start")
    return out.select(
        F.col("_doc").alias(id_col), F.col("_start").alias("start_pos")
    )


def rbo_overlap(
    run_a: DataFrame,
    run_b: DataFrame,
    query_col: str,
    id_col: str,
    rank_col: str = "rank",
    k: int = 10,
    out_dp: int = 6,
) -> DataFrame:
    """Rank-biased overlap (p = 1/2, truncated at depth ``k``) between
    two ranked runs, per query — the ranking-similarity readout for
    retrieval A/B work ("how differently do BM25 and the embedding
    run order the corpus"), top-weighted so rank-1 disagreements
    dominate tail shuffles.

        RBO@k = (1−p) · Σ_{d=1..k} p^(d−1) · |A_d ∩ B_d| / d
              = Σ_docs w(max(rank_a, rank_b))          [p = 1/2]

    where the per-doc weight ``w(m) = Σ_{d=m..k} 1/(d·2^d)`` counts
    every depth at which the doc is inside both prefixes. With
    p = 1/2 every term is the rational ``1/(d·2^d)``, so the weights
    are EXACT integers over the common denominator lcm(1..k)·2^k —
    the whole score is one integer sum per query, IEEE only in the
    final division. That exactness is why p is fixed rather than a
    parameter: an arbitrary p would put a float power inside an
    unordered sum.

    The truncated sum maxes at 1 − 2^−k (the tail mass RBO_min never
    sees), so the score is normalized by that factor — identical
    top-k rankings read exactly 1.0 at any k; the normalizer
    ``denom − denom/2^k`` is still an exact integer.

    Scale: one (query, doc) equi-join of two already-top-k runs + one
    aggregate keyed on the query — strictly cheaper than either run.
    Queries with NO shared top-k docs yield rbo = 0 via the left join
    against run_a's query set.
    """
    from math import lcm

    if k < 1:
        raise ValueError("k must be >= 1")
    if k > 26:
        # denom = lcm(1..k)*2^k crosses int64 at k=27 (~1.08e19): the
        # per-query weight sum would ANSI-overflow on identical
        # rankings. The exact-integer-lattice contract holds to k=26.
        raise ValueError("rbo_overlap: exact integer lattice caps k at 26")
    denom = lcm(*range(1, k + 1)) * (1 << k)
    w = [0] * (k + 2)
    for m in range(k, 0, -1):
        w[m] = w[m + 1] + denom // (m * (1 << m))
    weights = F.array(*[F.lit(w[m]) for m in range(1, k + 1)])
    a = run_a.select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(rank_col).cast("int").alias("_ra"),
        # ranks are 1-based: rank 0 would ANSI-crash element_at, and a
        # NEGATIVE rank silently indexes the weight array from the END
    ).filter((F.col("_ra") >= 1) & (F.col("_ra") <= k))
    b = run_b.select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(rank_col).cast("int").alias("_rb"),
    ).filter((F.col("_rb") >= 1) & (F.col("_rb") <= k))
    contrib = a.join(b, on=["_q", "_d"], how="inner").select(
        "_q",
        F.element_at(weights, F.greatest("_ra", "_rb")).alias("_w"),
    )
    scores = contrib.groupBy("_q").agg(F.sum("_w").alias("_s"))
    qs = a.select("_q").distinct()
    return qs.join(scores, on="_q", how="left").select(
        F.col("_q").alias(query_col),
        F.round(
            F.coalesce(F.col("_s"), F.lit(0)).cast("double")
            / F.lit(float(denom - denom // (1 << k))),
            out_dp,
        ).alias("rbo"),
    )
