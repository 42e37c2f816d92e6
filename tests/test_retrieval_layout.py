"""BM25 retrieval, Z-order layout, and table profiling semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from m3d_engine_spark.operators.reporting import profile_table
from m3d_engine_spark.operators.retrieval import bm25_topk
from m3d_engine_spark.sources.layout import zorder_key, zorder_write


def _py_bm25(corpus: dict[int, str], query: str, k1=1.2, b=0.75):
    """Reference scorer: plain-Python Okapi BM25 (Lucene idf)."""
    toks = {d: t.split() for d, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for term in set(query.split()):
            tf = t.count(term)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s > 0:
            scores[d] = round(s, 4)
    return scores


def test_bm25_matches_pure_python(spark):
    corpus = {
        1: "the cat sat on the mat",
        2: "the dog sat on the log",
        3: "cats and dogs and cats",
        4: "quantum flux capacitor energy",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(10, "cat sat"), (11, "quantum energy")], "query_id long, qtext string"
    )
    out = bm25_topk(docs, "doc_id", "text", queries, "query_id", "qtext", k=10)
    got = {
        (r.query_id, r.doc_id): (r.rank, r.score) for r in out.collect()
    }
    for qid, qtext in [(10, "cat sat"), (11, "quantum energy")]:
        expect = _py_bm25(corpus, qtext)
        ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (d, s) in enumerate(ranked, 1):
            assert got[(qid, d)] == (rank, s), (qid, d, got.get((qid, d)), s)
    # docs sharing no term with the query never appear
    assert (11, 1) not in got and (11, 2) not in got


def test_bm25_query_terms_deduplicated(spark):
    """Repeating a term in the query must not double its weight."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")], "doc_id long, text string"
    )
    single = spark.createDataFrame([(1, "alpha")], "query_id long, qtext string")
    repeated = spark.createDataFrame(
        [(1, "alpha alpha alpha")], "query_id long, qtext string"
    )
    s1 = {r.doc_id: r.score for r in
          bm25_topk(docs, "doc_id", "text", single, "query_id", "qtext").collect()}
    s2 = {r.doc_id: r.score for r in
          bm25_topk(docs, "doc_id", "text", repeated, "query_id", "qtext").collect()}
    assert s1 == s2


def _py_zkey(vals, mins, maxs, bits):
    z = 0
    for i, (v, mn, mx) in enumerate(zip(vals, mins, maxs)):
        s = 0 if mx <= mn else (v - mn) * ((1 << bits) - 1) // (mx - mn)
        for bit in range(bits):
            z |= ((s >> bit) & 1) << (bit * len(vals) + i)
    return z


def test_zorder_key_matches_pure_python(spark):
    rows = [(i, (i * 37) % 101, (i * 91) % 53) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r.id: r.zkey for r in zorder_key(df, ["x", "y"], bits=8).collect()}
    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    for i, x, y in rows:
        expect = _py_zkey(
            (x, y), (min(xs), min(ys)), (max(xs), max(ys)), 8
        )
        assert got[i] == expect, (i, got[i], expect)


def test_zorder_key_degenerate_and_limits(spark):
    df = spark.createDataFrame([(1, 5), (2, 5)], "id long, c long")
    out = zorder_key(df, ["c"], bits=8).collect()
    assert {r.zkey for r in out} == {0}  # constant column -> constant key
    try:
        zorder_key(df, ["c", "id"], bits=32)
        raise AssertionError("expected 64-bit overflow rejection")
    except ValueError:
        pass


def test_zorder_write_locality(spark, tmp_path):
    """Z-clustered files bound BOTH dimensions: for every file, the
    spread of x and of y is far below the global spread (that is the
    data-skipping property); a 1-column sort can only promise this for
    its own column."""
    rows = [(i, i % 256, (i * 7919) % 256) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    loc = str(tmp_path / "z")
    zorder_write(df, loc, ["x", "y"], bits=8, num_files=16)
    per_file = (
        spark.read.parquet(loc)
        .groupBy(F.input_file_name())
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(per_file) >= 8
    avg_sx = sum(r.sx for r in per_file) / len(per_file)
    avg_sy = sum(r.sy for r in per_file) / len(per_file)
    # global spread is 255 in each dimension; Z-cells must be tight in both
    assert avg_sx < 128 and avg_sy < 128, (avg_sx, avg_sy)


def test_profile_table_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (None, "a")],
        "k int, s string",
    )
    rows = {r.column: r for r in profile_table(df, ["k", "s"], exact=True).collect()}
    assert rows["k"].n_rows == 4 and rows["k"].n_nulls == 1
    assert rows["k"].n_distinct == 3
    assert (rows["k"].min_value, rows["k"].max_value) == ("1", "3")
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert (rows["s"].min_value, rows["s"].max_value) == ("a", "b")


def test_profile_table_sketch_tier_close(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r.column: r.n_distinct
        for r in profile_table(orders, ["o_custkey"], exact=True).collect()
    }
    approx = {
        r.column: r.n_distinct
        for r in profile_table(orders, ["o_custkey"], exact=False, rsd=0.02).collect()
    }
    e, a = exact["o_custkey"], approx["o_custkey"]
    assert abs(a - e) <= 0.05 * e, (e, a)


def test_numeric_histogram_semantics(spark):
    from m3d_engine_spark.operators.reporting import numeric_histogram

    df = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)], "x double"
    )
    rows = {r.bin: r for r in numeric_histogram(df, "x", bins=10).collect()}
    # 100 values over [0, 99]: max lands in the last bin (inclusive top)
    assert sum(r.n for r in rows.values()) == 100  # NULL excluded
    assert rows[9].n >= 10
    assert rows[0].lo_edge == 0.0 and rows[9].hi_edge == 99.0
    # explicit window: out-of-range clamps into end bins, nothing dropped
    clamped = {r.bin: r.n for r in
               numeric_histogram(df, "x", bins=4, lo=25.0, hi=75.0).collect()}
    assert sum(clamped.values()) == 100
    assert clamped[0] > 25 and clamped[3] > 25  # the clamped tails


def test_orc_format_round_trip(spark, tmp_path):
    from m3d_engine_spark.sources.formats import format_from_params

    fmt = format_from_params({"file_format": "orc"})
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    loc = str(tmp_path / "orc_rt")
    fmt.write(df, loc)
    back = fmt.read(spark, loc)
    assert sorted((r.k, r.v) for r in back.collect()) == [(1, "x"), (2, "y")]
