"""Embedding compression: int8 scalar quantization (SQ8).

Beyond-reference capability — the memory tier under the ANN family
(``operators/similarity.py``): an FP32 embedding column quantized to
per-dimension int8 codes is 4× smaller on disk and in shuffle, which
is the difference between an in-memory and a spilling ANN index at
10⁹ vectors. This is the "SQ8" storage format of the FAISS/Milvus
lineage, expressed as pure DataFrame ops.

How it runs:

    per-dimension (min, max) — posexplode + ONE keyed aggregate
      over dim_idx (≤ dim rows out)                         [1 shuffle: dim]
    → bounds pivoted to two dim-length arrays, broadcast    [1-row relation]
    → encode: code_i = clamp(floor((x_i − mn_i)·255/(mx_i − mn_i)))
      as a JVM array transform                              [projection]
    → decode / error: x̂_i = mn_i + (code_i + 0.5)·Δ_i/255  [projection]

The bounds relation is dim-sized (64 doubles here) regardless of
corpus size, so it broadcasts as a 1-row array pair and encoding is a
zero-exchange projection over the scan — the quantizer "trains" in one
aggregate pass and applies map-side, exactly the shape a write-time
re-encode of 100 TB of embeddings needs. Degenerate dimensions
(mx == mn) encode to 0 and decode to the midpoint of their collapsed
range.

Determinism: min/max are exact selections (no summation); the encode
expression is the same IEEE double arithmetic in any engine; the
reconstruction error folds squared diffs in index order and rounds to
4dp (the cosine-entry contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from m3d_engine_spark.functions.idents import qident


def sq8_bounds(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """ONE-row relation (mns, mxs): per-dimension min/max as two
    ``dim``-length arrays, ordered by dimension index. Vectors are
    sliced to ``dim`` first, so trailing dimensions beyond the declared
    width never leak into the bounds."""
    per_dim = (
        df.select(
            F.posexplode(F.slice(F.col(vec_col), 1, int(dim))).alias(
                "_i", "_x"
            )
        )
        .groupBy("_i")
        .agg(F.min("_x").cast("double").alias("_mn"),
             F.max("_x").cast("double").alias("_mx"))
    )
    return per_dim.agg(
        F.array_sort(
            F.collect_list(F.struct("_i", "_mn"))
        ).alias("_a"),
        F.array_sort(
            F.collect_list(F.struct("_i", "_mx"))
        ).alias("_b"),
    ).select(
        F.expr("transform(_a, s -> s._mn)").alias("mns"),
        F.expr("transform(_b, s -> s._mx)").alias("mxs"),
    )


def sq8_encode(
    df: DataFrame,
    vec_col: str,
    dim: int,
    bounds: DataFrame | None = None,
    codes_col: str = "codes",
) -> DataFrame:
    """Append ``codes_col``: the int8 code array (values 0..255 as
    ints). ``bounds`` defaults to ``sq8_bounds`` over ``df`` itself;
    pass a precomputed/persisted bounds relation to encode new batches
    against a frozen quantizer (the production path — train once at
    index build, apply forever)."""
    b = F.broadcast(bounds if bounds is not None else sq8_bounds(df, vec_col, dim))
    # Degenerate rows (NULL vector, fewer than dim values) encode to
    # the -1 sentinel array instead of an ANSI INVALID_ARRAY_INDEX
    # crash on element_at — the pq_topk contract, applied uniformly.
    code = (
        f"CASE WHEN size({qident(vec_col)}) >= {int(dim)} THEN "
        f"transform(sequence(1, {int(dim)}), i -> CASE "
        f"WHEN element_at(mxs, i) <= element_at(mns, i) THEN 0 "
        f"ELSE least(greatest(CAST(floor("
        f"(CAST(element_at({qident(vec_col)}, i) AS DOUBLE) - element_at(mns, i)) * 255.0D "
        f"/ (element_at(mxs, i) - element_at(mns, i))) AS INT), 0), 255) END) "
        f"ELSE array_repeat(-1, {int(dim)}) END"
    )
    return df.crossJoin(b).withColumn(codes_col, F.expr(code))


def _md5_seed_rows(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """The first ``k`` vectors in (md5(id), id) order — the shared
    deterministic seed sample behind both codebook builders."""
    return (
        df.select(
            F.md5(F.col(id_col).cast("string")).alias("_o"),
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .orderBy("_o", "_id")
        .limit(int(k))
    )


def _argmin_struct_over_k(d2_expr: str, k: int) -> str:
    """SQL fragment: struct('bc', 'bd') = (0-based index, value) of
    the minimum of ``d2_expr`` evaluated at c = 0..k-1; ties keep the
    SMALLEST c; degenerate inputs (NaN distances) keep the -1
    sentinel. The k distances are materialized ONCE and bound as the
    lambda variable ``ds`` via the transform(array(...)) trick
    (Catalyst would otherwise re-inline — and re-evaluate — the
    distance fold per comparison)."""
    return (
        f"element_at(transform(array(transform(sequence(0, {int(k) - 1}), c -> {d2_expr})), "
        f"ds -> aggregate(sequence(0, {int(k) - 1}), "
        f"named_struct('bc', -1, 'bd', CAST('Infinity' AS DOUBLE)), "
        f"(acc, c) -> CASE WHEN element_at(ds, c + 1) < acc.bd "
        f"THEN named_struct('bc', c, 'bd', element_at(ds, c + 1)) "
        f"ELSE acc END)), 1)"
    )


def _argmin_over_k(d2_expr: str, k: int) -> str:
    """Index-only form of ``_argmin_struct_over_k``."""
    return _argmin_struct_over_k(d2_expr, k) + ".bc"


def pq_codebook(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
) -> DataFrame:
    """ONE-row relation (cents): a deterministic ``k``-vector codebook
    — the first ``k`` vectors in (md5(id), id) order, the same
    sampled-quantizer convention as IVF's coarse centroids
    (``operators/similarity.py``). ``cents[c]`` is centroid ``c-1``
    (1-based array access); ``pq_codebook_trained`` is the drop-in
    upgrade — the encode topology below does not change."""
    seeds = _md5_seed_rows(df, id_col, vec_col, k)
    n = seeds.count()  # k-sized relation; the check is model-sized work
    if n < k:
        raise ValueError(
            f"pq_codebook: k={k} exceeds the corpus row count {n} — "
            f"the encode argmin would probe missing centroids; lower k"
        )
    return seeds.agg(
        F.array_sort(F.collect_list(F.struct("_o", "_id", "_v"))).alias("_s")
    ).select(F.expr("transform(_s, s -> s._v)").alias("cents"))


def pq_codebook_trained(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 16,
    k: int = 16,
    iterations: int = 2,
) -> DataFrame:
    """Per-subspace Lloyd-trained PQ codebook — the quality upgrade
    over the md5-sampled seeds (``pq_codebook``), same output shape so
    ``pq_encode``/``pq_topk``/``pq_search`` take it unchanged.

    ALL m subspaces train in the SAME job each round: vectors explode
    once into (subspace, subvector) rows, assignment is an argmin fold
    against the broadcast all-subspace codebook, and the centroid
    update is one (subspace, cluster, dim) mean aggregate whose
    m·k·(dim/m) = k·dim-row result is collected (model-sized — the
    only driver traffic). Per round: one explode-scan + one keyed
    aggregate; ``iterations`` rounds total. Empty clusters keep their
    previous centroid (Lloyd degenerate-case handling). Deterministic:
    md5-ranked init, exact argmin tie-break to the smaller id, means
    over fixed membership."""
    dim, m, k = int(dim), int(m), int(k)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    w = dim // m
    spark = df.sparkSession
    seeds = _md5_seed_rows(df, id_col, vec_col, k).collect()
    if len(seeds) < k:
        raise ValueError(
            f"pq_codebook_trained: k={k} exceeds the corpus row count "
            f"{len(seeds)}; lower k"
        )
    # cents[j][c] = subvector j of seed c
    cents = [
        [list(r["_v"][j * w : (j + 1) * w]) for r in seeds] for j in range(m)
    ]
    subs = F.expr(
        f"transform(sequence(0, {m - 1}), j -> "
        f"slice(CAST({qident(vec_col)} AS array<double>), j * {w} + 1, {w}))"
    )
    # training reads only full-width vectors: a short/NULL vector's
    # sliced subvectors would OOB the distance fold under ANSI (the
    # encode path handles degenerates with the -1 sentinel; training
    # simply excludes them from the means)
    rows = df.filter(
        F.expr(f"size({qident(vec_col)}) >= {dim}")
    ).select(F.posexplode(subs).alias("j", "sv"))
    d2 = (
        f"aggregate(sequence(1, {w}), 0.0D, (a, t) -> a + "
        f"(element_at(sv, t) - element_at(element_at(element_at(cb, j + 1), c + 1), t)) * "
        f"(element_at(sv, t) - element_at(element_at(element_at(cb, j + 1), c + 1), t)))"
    )
    argmin = _argmin_over_k(d2, k)
    for _ in range(int(iterations)):
        cb_df = spark.createDataFrame(
            [(cents,)], "cb array<array<array<double>>>"
        )
        means = (
            rows.crossJoin(F.broadcast(cb_df))
            .select("j", "sv", F.expr(argmin).alias("c"))
            # the argmin sentinel (-1) survives only for degenerate
            # inputs (NaN values, short vectors); letting it through
            # would negative-index INTO centroid k-1 below — drop it
            .filter(F.col("c") >= 0)
            .select("j", "c", F.posexplode("sv").alias("t", "x"))
            .groupBy("j", "c", "t")
            # decimal-exact mean (same discipline as kmeans.py): a
            # double avg's partial-merge order would make centroids
            # run-dependent, breaking the deterministic-retrain pin
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(27,10)"))
                    / F.count(F.lit(1))
                ).cast("double").alias("mu")
            )
            .collect()
        )
        for r in means:
            cents[r["j"]][r["c"]][r["t"]] = float(r["mu"])
    full = [
        [x for j in range(m) for x in cents[j][c]] for c in range(k)
    ]
    return spark.createDataFrame([(full,)], "cents array<array<double>>")


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 8,
    k: int = 16,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Product quantization: split each vector into ``m`` subvectors of
    width dim/m; each subvector is replaced by the id of its nearest
    codebook subvector (L2², ties to the smallest id). Appends
    ``codes`` (m ints in [0, k)) and ``pq_err`` (the exact L2
    reconstruction error of the coded vector, 4dp).

    Scale shape — the billion-vector ANN compression tier: the
    codebook is k vectors (BROADCAST, the single 1-row BNLJ); the
    argmin over k centroids per subspace is a nested JVM array fold —
    a pure zero-exchange projection, NEVER an exploded N×k×m relation
    (at 10⁹ vectors that relation is 128× the corpus; the projection
    form keeps encode embarrassingly parallel over the scan). Memory:
    m bytes per vector vs 4·dim — 32× smaller at dim=64, m=8.

    Determinism: distances are identical IEEE folds in any engine
    (index order), the argmin keeps the FIRST minimum (smallest
    centroid id), and the codebook order is md5-pinned.
    """
    dim, m, k = int(dim), int(m), int(k)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    w = dim // m
    cb = F.broadcast(
        codebook if codebook is not None else pq_codebook(df, id_col, vec_col, k)
    )
    d2 = (
        f"aggregate(sequence(1, {w}), 0.0D, (a, t) -> a + "
        f"(CAST(element_at({qident(vec_col)}, j * {w} + t) AS DOUBLE) - "
        f"element_at(element_at(cents, c + 1), j * {w} + t)) * "
        f"(CAST(element_at({qident(vec_col)}, j * {w} + t) AS DOUBLE) - "
        f"element_at(element_at(cents, c + 1), j * {w} + t)))"
    )
    # The k distances are materialized ONCE per subspace (bound as the
    # lambda variable `ds` via the transform(array(...)) trick — the
    # same Catalyst re-inlining dodge gopher_quality uses), then a
    # cheap O(k) argmin folds over them; inlining the w-term distance
    # fold into the CASE would evaluate it twice per centroid.
    # Degenerate rows (NULL vector, fewer than dim values) take the -1
    # sentinel codes and a NULL pq_err instead of an ANSI
    # INVALID_ARRAY_INDEX crash inside the distance fold.
    asn = (
        f"CASE WHEN size({qident(vec_col)}) >= {dim} THEN "
        f"transform(sequence(0, {m - 1}), j -> "
        f"{_argmin_struct_over_k(d2, k)}) "
        f"ELSE transform(sequence(0, {m - 1}), j -> "
        f"named_struct('bc', -1, 'bd', CAST(NULL AS DOUBLE))) END"
    )
    return (
        df.crossJoin(cb)
        .withColumn("_asn", F.expr(asn))
        .select(
            "*",
            F.expr("transform(_asn, s -> s.bc)").alias("codes"),
            F.expr(
                "round(sqrt(aggregate(_asn, 0.0D, (a, s) -> a + s.bd)), 4)"
            ).alias("pq_err"),
        )
        # the broadcast codebook column must not ride out on every row
        # (k x dim doubles per row if the caller materializes the
        # encode output); the docstring promises codes + pq_err only
        .drop("_asn", "cents")
    )


def pq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    codebook: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    topk: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over PQ codes — the
    search half of product quantization: each query computes its m×k
    table of exact subspace distances to the codebook ONCE; a corpus
    vector's approximate distance is then m table lookups summed —
    O(m) per corpus row instead of O(dim), over codes that are 32×
    smaller than the vectors.

    Topology: the query×codebook distance tables are
    (|queries|·m·k)-sized — broadcast; scoring the corpus is a
    zero-shuffle projection over the codes scan (lookups via
    element_at into the broadcast table array); per-query top-k runs
    as WindowGroupLimit. The corpus' full vectors are never read —
    that is the point: at 10⁹ vectors the codes fit where the vectors
    do not. Returns (query_id, id, rank, adc_dist) with
    round(·, 4) distances, ties broken by id.

    ``exclude_self`` (default True) drops corpus rows whose id equals
    the query id — correct when queries are DRAWN FROM the corpus (the
    self-match is a trivial 0-distance hit). Pass False when the query
    table is a separate relation whose id space merely overlaps the
    corpus ids: there the "self" row is a legitimate — possibly the
    true nearest — neighbor. (``bm25_topk`` has no such exclusion; the
    flag keeps the retrieval APIs reconcilable.)

    Degenerate vectors (NaN dims, short arrays) encode to the -1
    argmin sentinel; those rows score ``+Infinity`` and therefore rank
    after every real candidate (they only surface when a query has
    fewer than ``topk`` healthy corpus rows). The guard is a lazy CASE
    INSIDE the scoring projection, deliberately NOT a Filter: any
    codes-derived predicate gets substituted through the encode
    projection by predicate pushdown — Catalyst re-inlines the full
    per-subspace argmin into the join condition, re-encoding the
    corpus per PAIR (measured 1.4× on the whole query at sf0.1). The
    CASE reads the materialized ``codes`` attribute across the join
    boundary, keeps the ANSI ``element_at`` from ever seeing index 0,
    and costs one O(m) forall per pair.
    """
    dim, m, k, topk = int(dim), int(m), int(k), int(topk)
    w = dim // m
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    # per-query flat distance table: entry (j*k + c) = L2² between the
    # query's subvector j and centroid c's subvector j
    d2 = (
        f"aggregate(sequence(1, {w}), 0.0D, (a, t) -> a + "
        f"(CAST(element_at(_qv, j * {w} + t) AS DOUBLE) - "
        f"element_at(element_at(cents, c + 1), j * {w} + t)) * "
        f"(CAST(element_at(_qv, j * {w} + t) AS DOUBLE) - "
        f"element_at(element_at(cents, c + 1), j * {w} + t)))"
    )
    table = (
        f"flatten(transform(sequence(0, {m - 1}), j -> "
        f"transform(sequence(0, {k - 1}), c -> {d2})))"
    )
    qt = F.broadcast(
        queries.select(
            F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv")
        )
        .crossJoin(F.broadcast(codebook))
        .select("_qid", F.expr(table).alias("_tbl"))
    )
    adc = (
        f"CASE WHEN forall(codes, c -> c >= 0) THEN "
        f"round(aggregate(sequence(0, {m - 1}), 0.0D, (a, j) -> "
        f"a + element_at(_tbl, j * {k} + element_at(codes, j + 1) + 1)), 4) "
        f"ELSE CAST('Infinity' AS DOUBLE) END"
    )
    scored = (
        corpus_codes.select(F.col(id_col), F.col("codes"))
        .crossJoin(qt)
        .select(
            "_qid", F.col(id_col), F.expr(adc).alias("adc_dist")
        )
    )
    if exclude_self:
        scored = scored.filter(F.col("_qid") != F.col(id_col))
    w_rank = Window.partitionBy("_qid").orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= topk)
        .select(
            F.col("_qid").alias("query_id"), F.col(id_col), "rank", "adc_dist"
        )
    )


def pq_search(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 16,
    k: int = 16,
    shortlist: int = 100,
    topk: int = 5,
    codebook: DataFrame | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """PQ search the way production uses it: the lossy ADC ranking is a
    SHORTLIST generator, not the answer — ADC over codes prunes the
    corpus to ``shortlist`` candidates per query (codes-only scan, full
    vectors untouched), then an exact L2 re-rank reads real vectors for
    only |queries|·shortlist rows. At 10⁹ vectors stage 1 touches 16×
    less data than a brute-force scan at the default m=16 dials (32×
    at m=8) and stage 2 is candidate-sized;
    recall@5 ≥ 0.9 at the default dials is pinned by test (pure ADC
    ranks these synthetic near-random embeddings at ~0.3-0.4 — the
    re-rank stage is not optional, which is exactly the design lesson).

    Returns (query_id, id, rank, l2_dist) — rank by EXACT distance,
    4dp, ties to the smaller id."""
    dim, topk = int(dim), int(topk)
    if codebook is None:
        # Materialize the default codebook ONCE (model-sized collect +
        # local 1-row relation): the lazy pq_codebook subtree is
        # consumed by BOTH pq_encode's broadcast and pq_topk's
        # query-table broadcast — left lazy, its full-corpus
        # TakeOrdered seed sample would execute twice in one query.
        cents = pq_codebook(corpus, id_col, vec_col, k).first()["cents"]
        codebook = corpus.sparkSession.createDataFrame(
            [(cents,)], "cents array<array<double>>"
        )
    cb = codebook
    codes = pq_encode(
        corpus, id_col, vec_col, dim=dim, m=m, k=k, codebook=cb
    ).select(F.col(id_col), F.col("codes"))
    cand = pq_topk(
        codes, queries, id_col, vec_col, cb, dim=dim, m=m, k=k,
        topk=int(shortlist), exclude_self=exclude_self,
    ).select("query_id", F.col(id_col))
    return _exact_l2_rerank(cand, corpus, queries, id_col, vec_col, dim, topk)


def _exact_l2_rerank(
    cand: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    topk: int,
) -> DataFrame:
    """Stage 2 shared by ``pq_search`` and ``ivfpq_search``: exact L2
    over the (query_id, id) candidate relation only — the full vectors
    are read for |queries|·shortlist rows, never the corpus. Returns
    (query_id, id, rank, l2_dist), rank by exact distance, 4dp, ties
    to the smaller id.

    Degenerate corpus vectors (short arrays) can reach the shortlist
    when a query has too few healthy candidates (they ADC-score
    +Infinity upstream, never earlier); the size guard keeps the ANSI
    ``element_at`` from crashing on them and ranks them last."""
    dim, topk = int(dim), int(topk)
    l2 = (
        f"CASE WHEN size(_cv) >= {dim} THEN "
        f"round(aggregate(sequence(1, {dim}), 0.0D, (a, t) -> a + "
        f"(CAST(element_at(_qv, t) AS DOUBLE) - CAST(element_at(_cv, t) AS DOUBLE)) * "
        f"(CAST(element_at(_qv, t) AS DOUBLE) - CAST(element_at(_cv, t) AS DOUBLE)))"
        f", 4) ELSE CAST('Infinity' AS DOUBLE) END"
    )
    rer = (
        cand.join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"),
                    F.col(vec_col).alias("_qv"),
                )
            ),
            on="query_id",
        )
        .join(
            corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")),
            on=id_col,
        )
        .select("query_id", F.col(id_col), F.expr(l2).alias("l2_dist"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("l2_dist").asc(), F.col(id_col).asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= topk)
        .select("query_id", id_col, "rank", "l2_dist")
    )


def sq8_reconstruction_error(
    encoded: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    codes_col: str = "codes",
) -> DataFrame:
    """(id, code0, code_sum, recon_err): the quantization audit —
    exact-integer code digest plus the per-vector L2 reconstruction
    error of the midpoint decode, rounded to 4dp. Expects ``encoded``
    to still carry the bounds arrays from ``sq8_encode`` (it does
    unless dropped). Pure projection — zero exchanges."""
    dec = (
        "element_at(mns, i) + (element_at({c}, i) + 0.5D) * "
        "(element_at(mxs, i) - element_at(mns, i)) / 255.0D"
    ).format(c=qident(codes_col))
    diff = f"(CAST(element_at({qident(vec_col)}, i) AS DOUBLE) - ({dec}))"
    err = (
        f"round(sqrt(aggregate(sequence(1, {int(dim)}), 0.0D, "
        f"(acc, i) -> acc + {diff} * {diff})), 4)"
    )
    return encoded.select(
        F.col(id_col),
        F.element_at(F.col(codes_col), 1).alias("code0"),
        F.expr(
            f"aggregate({qident(codes_col)}, 0L, (acc, c) -> acc + c)"
        ).alias(
            "code_sum"
        ),
        F.expr(err).alias("recon_err"),
    )


def ivfpq_search(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k: int = 16,
    shortlist: int = 100,
    topk: int = 5,
    cells: DataFrame | None = None,
    codebook: DataFrame | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-PQ retrieval — the production billion-vector ANN shape
    (FAISS ``IVFx,PQy`` lineage): a coarse quantizer prunes WHICH rows
    are scored, product quantization prunes HOW MUCH of each row is
    read, and an exact re-rank restores accuracy on the shortlist.

        coarse: cell(v) = argmin_c L2²(v, cells[c])   — inverted lists
        probe:  each query scores only its n_probe nearest cells
        ADC:    m table lookups per candidate over the 32×-smaller codes
        rerank: exact L2 over |queries|·shortlist candidate vectors

    Topology (the reason this survives 10⁹ vectors where ``pq_topk``'s
    full-corpus ADC scan does not):

    * Corpus prep is ONE zero-exchange projection: the cell argmin and
      the PQ encode both fold against broadcast 1-row relations
      (coarse cells + codebook), so (id, cell, codes) is computed in a
      single scan — at write time this materializes as a table
      partitioned by ``cell``.
    * The probe stage is an EQUI-JOIN on ``cell`` between the codes
      relation and the exploded (query, probed-cell) list — candidates
      are n_probe/n_cells of the corpus, not all of it; against a
      cell-partitioned codes table the join is a pruned scan.
    * ADC tables (|queries|·m·k doubles) and probe lists ride the same
      broadcast; scoring is a projection on the join output; per-query
      shortlist is a WindowGroupLimit; stage-2 re-rank reads real
      vectors for candidates only (shared with ``pq_search``).

    Both quantizers default to the md5-sampled convention (
    ``pq_codebook``) so the whole operator is oracle-checkable; pass
    ``cells`` / ``codebook`` (any 1-row ``cents array<array<double>>``
    relation, e.g. ``pq_codebook_trained`` output) to swap in trained
    models — the topology does not change. Codes here quantize RAW
    vectors, not residuals (residual PQ needs a per-cell codebook —
    a model change, not a topology change; documented trade-off).

    Returns (query_id, id, rank, l2_dist) — rank by EXACT distance,
    4dp, ties to the smaller id. ``exclude_self`` semantics and the
    -1-sentinel candidate guard are as documented on ``pq_topk``.
    """
    dim, n_cells, n_probe = int(dim), int(n_cells), int(n_probe)
    m, k, shortlist, topk = int(m), int(k), int(shortlist), int(topk)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    spark = corpus.sparkSession

    def _materialized(model: DataFrame | None, kk: int) -> DataFrame:
        # Materialize each default model ONCE (model-sized collect +
        # local 1-row relation) — the lazy pq_codebook subtree would
        # otherwise re-run its full-corpus TakeOrdered seed sample in
        # every consumer (same discipline as pq_search).
        if model is not None:
            return model
        cents = pq_codebook(corpus, id_col, vec_col, kk).first()["cents"]
        return spark.createDataFrame(
            [(cents,)], "cents array<array<double>>"
        )

    cells_df = F.broadcast(
        _materialized(cells, n_cells).select(F.col("cents").alias("cells"))
    )
    cb = _materialized(codebook, k)

    # --- corpus side: (id, cell, codes) in one scan, zero exchanges
    def _cell_d2(vc: str) -> str:
        return (
            f"aggregate(sequence(1, {dim}), 0.0D, (a, t) -> a + "
            f"(CAST(element_at({vc}, t) AS DOUBLE) - "
            f"element_at(element_at(cells, c + 1), t)) * "
            f"(CAST(element_at({vc}, t) AS DOUBLE) - "
            f"element_at(element_at(cells, c + 1), t)))"
        )

    cell_expr = _argmin_over_k(_cell_d2(qident(vec_col)), n_cells)
    codes = (
        pq_encode(corpus, id_col, vec_col, dim=dim, m=m, k=k, codebook=cb)
        .select(F.col(id_col), F.col(vec_col), F.col("codes"))
        .crossJoin(cells_df)
        .select(
            F.col(id_col),
            # coalesce with a non-null literal makes the column
            # NON-NULLABLE to Catalyst: without it the probe equi-join
            # derives isnotnull(cell), pushdown substitutes the whole
            # cell-argmin into that predicate, and the re-inlined
            # expression fuses into the cells BNLJ — the assignment
            # evaluated twice per corpus row (the pq_topk pushdown
            # hazard, BASELINE.md round-8). -1 never matches a probe.
            F.coalesce(F.expr(cell_expr), F.lit(-1)).alias("cell"),
            F.col("codes"),
        )
    )

    # --- query side: ADC table + n_probe nearest cells, one broadcast
    w = dim // m
    q_sub_d2 = (
        f"aggregate(sequence(1, {w}), 0.0D, (a, t) -> a + "
        f"(CAST(element_at(_qv, j * {w} + t) AS DOUBLE) - "
        f"element_at(element_at(cents, c + 1), j * {w} + t)) * "
        f"(CAST(element_at(_qv, j * {w} + t) AS DOUBLE) - "
        f"element_at(element_at(cents, c + 1), j * {w} + t)))"
    )
    table = (
        f"flatten(transform(sequence(0, {m - 1}), j -> "
        f"transform(sequence(0, {k - 1}), c -> {q_sub_d2})))"
    )
    q_cell_d2 = _cell_d2("_qv")
    probes = (
        f"transform(slice(array_sort(transform(sequence(0, {n_cells - 1}), "
        f"c -> named_struct('d', {q_cell_d2}, 'c', c))), 1, {n_probe}), "
        f"s -> s.c)"
    )
    qt = F.broadcast(
        queries.select(
            F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv")
        )
        .crossJoin(F.broadcast(cb))
        .crossJoin(cells_df)
        .select(
            "_qid",
            F.expr(table).alias("_tbl"),
            F.explode(F.expr(probes)).alias("cell"),
        )
    )

    # --- probe join + ADC shortlist
    # Degenerate vectors need no cell filter: the -1 sentinel cell can
    # never equal a probe (probes enumerate 0..n_cells-1), so the
    # equi-join drops them for free. The -1 code guard is the lazy
    # CASE inside the scoring projection — a Filter here would be
    # predicate-pushed through the encode projection, re-inlining the
    # full argmin into the scan (see pq_topk docstring; measured 1.4×).
    adc = (
        f"CASE WHEN forall(codes, c -> c >= 0) THEN "
        f"round(aggregate(sequence(0, {m - 1}), 0.0D, (a, j) -> "
        f"a + element_at(_tbl, j * {k} + element_at(codes, j + 1) + 1)), 4) "
        f"ELSE CAST('Infinity' AS DOUBLE) END"
    )
    scored = codes.join(qt, on="cell")
    if exclude_self:
        scored = scored.filter(F.col("_qid") != F.col(id_col))
    scored = (
        scored
        .select(
            F.col("_qid").alias("query_id"),
            F.col(id_col),
            F.expr(adc).alias("adc_dist"),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    cand = (
        scored.withColumn("_rn", F.row_number().over(w_short))
        .filter(F.col("_rn") <= shortlist)
        .select("query_id", F.col(id_col))
    )
    return _exact_l2_rerank(cand, corpus, queries, id_col, vec_col, dim, topk)
