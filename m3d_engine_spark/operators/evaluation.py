"""Retrieval evaluation: nDCG@k and recall@k over ranked runs.

Beyond-reference capability completing the retrieval family
(``retrieval.py`` scores, ``similarity.py`` retrieves,
``rbo_overlap`` compares two runs against each other): these compare
a run against GROUND TRUTH — graded labels for nDCG, the exact
neighbor set for recall — the numbers an offline search/RAG
evaluation actually reports.

Determinism discipline: the DCG weights ``1/log2(r+1)`` are
irrational, so they enter as PYTHON-COMPUTED integer literals on a
10^12 lattice (identical source text in both engines — no libm call
at query time at all), per-query sums are exact integer sums, and the
final DCG/IDCG division is one IEEE op. Same trick as the RBO
rational weights.

Scale: every input is already top-k-bounded per query; label lookup
and truth join are broadcast-sized; one aggregate keyed on the query.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LATTICE = 10**12


def _dcg_weights(k: int) -> list[int]:
    return [round(_LATTICE / math.log2(r + 1)) for r in range(1, k + 1)]


def ndcg_at_k(
    run: DataFrame,
    truth: DataFrame,
    query_col: str,
    id_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
    out_dp: int = 6,
) -> DataFrame:
    """nDCG@k per query: ``run`` is a ranked result list, ``truth``
    holds binary/graded relevance ``rel_col`` per (query, doc) —
    absent pairs count 0. IDCG uses the ideal ordering of the query's
    OWN truth grades (top-k by grade), so a query with fewer than k
    relevant documents is not penalized for the impossible tail.
    Returns (query, n_rel, dcg, idcg, ndcg) for every query present
    in the run or the truth: queries with zero relevant docs (or
    absent from truth entirely) emit a row with n_rel=0 and NULL
    idcg/ndcg, so per-query averages see them instead of silently
    skipping them; queries with truth but missing from the run emit
    dcg=0.
    """
    w = _dcg_weights(k)
    warr = F.array(*[F.lit(x) for x in w])
    # ranks are 1-based: rank 0 would ANSI-crash element_at, and a
    # negative sentinel rank silently indexes weights from the END
    r = run.filter(
        (F.col(rank_col) >= 1) & (F.col(rank_col) <= k)
    ).select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.element_at(warr, F.col(rank_col).cast("int")).alias("_w"),
    )
    t = truth.select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(rel_col).cast("long").alias("_rel"),
    ).filter(F.col("_rel") > 0)
    dcg = (
        r.join(t, on=["_q", "_d"], how="left")
        .groupBy("_q")
        .agg(
            F.sum(
                F.coalesce(F.col("_rel"), F.lit(0)) * F.col("_w")
            ).alias("_dcg_l")
        )
    )
    # ideal: the query's own grades, best-first, weighted by position
    from pyspark.sql import Window

    wnd = Window.partitionBy("_q").orderBy(F.col("_rel").desc(), F.col("_d").asc())
    ideal = (
        t.withColumn("_r", F.row_number().over(wnd))
        .filter(F.col("_r") <= k)
        .groupBy("_q")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_rel"),
            F.sum(
                F.col("_rel") * F.element_at(warr, F.col("_r"))
            ).alias("_idcg_l"),
        )
    )
    # Universe of queries BEFORE the rel>0 / rank<=k filters: a query
    # whose truth rows are all rel=0 (and which the run missed) must
    # still emit its n_rel=0 row — the full join of the filtered CTEs
    # alone can't see it.
    qs = (
        run.select(F.col(query_col).alias("_q"))
        .union(truth.select(F.col(query_col).alias("_q")))
        .distinct()
    )
    return (
        qs.join(ideal, on="_q", how="left")
        .join(dcg, on="_q", how="left")
        .select(
            F.col("_q").alias(query_col),
            F.coalesce(F.col("n_rel"), F.lit(0).cast("int")).alias("n_rel"),
            F.round(
                F.coalesce(F.col("_dcg_l"), F.lit(0)) / F.lit(float(_LATTICE)), out_dp
            ).alias("dcg"),
            F.round(F.col("_idcg_l") / F.lit(float(_LATTICE)), out_dp).alias("idcg"),
            F.round(
                F.coalesce(F.col("_dcg_l"), F.lit(0)).cast("double")
                / F.col("_idcg_l").cast("double"),
                out_dp,
            ).alias("ndcg"),
        )
    )


def recall_at_k(
    run: DataFrame,
    exact: DataFrame,
    query_col: str,
    id_col: str,
    rank_col: str,
    k: int = 10,
) -> DataFrame:
    """Recall@k of an approximate run against the exact top-k run over
    the same corpus: |approx@k ∩ exact@k| / |exact@k| per query — THE
    ANN quality dial (the per-operator recall floors pinned in the
    test suite are aggregates of exactly this relation). One
    (query, doc) join of two bounded runs + one query-keyed aggregate.
    """
    a = run.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"), F.col(id_col).alias("_d")
    )
    e = exact.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"), F.col(id_col).alias("_d")
    )
    hits = a.join(e, on=["_q", "_d"], how="inner").groupBy("_q").agg(
        F.count(F.lit(1)).alias("_hit")
    )
    totals = e.groupBy("_q").agg(F.count(F.lit(1)).alias("_n"))
    return totals.join(hits, on="_q", how="left").select(
        F.col("_q").alias(query_col),
        F.col("_n").cast("int").alias("n_exact"),
        F.coalesce(F.col("_hit"), F.lit(0)).cast("int").alias("n_hit"),
        F.round(
            F.coalesce(F.col("_hit"), F.lit(0)) / F.col("_n"), 6
        ).alias("recall"),
    )
