"""Regression tests for the round-6 ADVICE findings.

Pins: (1) pq_topk / ivfpq_search must not ADC-score -1 sentinel codes
from degenerate vectors (ANSI INVALID_ARRAY_INDEX for subspace 0,
silent wrong-table reads otherwise) — since round 8 the guard is a
lazy CASE inside the scoring projection (a Filter was predicate-pushed
through the encode projection, re-inlining the argmin per pair:
measured 1.4× at sf0.1), so degenerate rows rank LAST at +Infinity in
pq_topk and are dropped by the cell equi-join in ivfpq_search; (2) the
query-id self-exclusion in the PQ retrieval APIs is now an opt-out
flag — with a separate query table, exclude_self=False keeps the
overlapping-id corpus row as a legitimate neighbor; (3) the 'text'
file format validates its one-STRING-column constraint eagerly instead
of failing opaquely at read/write time.
"""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

from m3d_engine_spark.operators.quantization import (
    ivfpq_search,
    pq_codebook,
    pq_encode,
    pq_topk,
)
from m3d_engine_spark.sources.formats import DataFormat


def _vec(seed: float, dim: int = 8) -> list[float]:
    return [math.sin(seed * (i + 1)) for i in range(dim)]


@pytest.fixture(scope="module")
def pq_world(spark):
    corpus = spark.createDataFrame(
        [(i, _vec(float(i))) for i in range(1, 21)]
        # degenerate row: NaN dims → -1 argmin sentinel in every subspace
        + [(99, [float("nan")] * 8)],
        "id int, emb array<double>",
    )
    cb = pq_codebook(corpus.filter("id < 90"), "id", "emb", 4)
    cents = cb.first()["cents"]
    codebook = spark.createDataFrame([(cents,)], "cents array<array<double>>")
    codes = pq_encode(corpus, "id", "emb", dim=8, m=2, k=4, codebook=codebook)
    return corpus, codebook, codes


def test_pq_topk_sentinel_codes_rank_last(spark, pq_world):
    corpus, codebook, codes = pq_world
    assert codes.filter("id = 99").first()["codes"] == [-1, -1]
    queries = corpus.filter("id <= 2")
    # wide topk (> healthy corpus): the degenerate row surfaces, but
    # LAST, at +Infinity — and no ANSI element_at crash reaching it
    wide = pq_topk(
        codes.select("id", "codes"), queries, "id", "emb", codebook,
        dim=8, m=2, k=4, topk=25,
    ).collect()
    assert wide
    for qid in {r["query_id"] for r in wide}:
        rows = sorted((r for r in wide if r["query_id"] == qid),
                      key=lambda r: r["rank"])
        assert rows[-1]["id"] == 99
        assert rows[-1]["adc_dist"] == float("inf")
        assert all(r["adc_dist"] < float("inf") for r in rows[:-1])
    # normal topk (< healthy corpus): the degenerate row never surfaces
    tight = pq_topk(
        codes.select("id", "codes"), queries, "id", "emb", codebook,
        dim=8, m=2, k=4, topk=5,
    ).collect()
    assert tight and all(r["id"] != 99 for r in tight)


def test_pq_topk_exclude_self_flag(spark, pq_world):
    corpus, codebook, codes = pq_world
    queries = corpus.filter("id = 5")
    kept = pq_topk(
        codes.select("id", "codes"), queries, "id", "emb", codebook,
        dim=8, m=2, k=4, topk=3, exclude_self=False,
    ).collect()
    # with a 0-distance code match, the "self" row is the top hit
    assert kept[0]["id"] == 5 and kept[0]["rank"] == 1
    dropped = pq_topk(
        codes.select("id", "codes"), queries, "id", "emb", codebook,
        dim=8, m=2, k=4, topk=3,
    ).collect()
    assert all(r["id"] != 5 for r in dropped)


def test_ivfpq_search_skips_sentinel_codes(spark, pq_world):
    corpus, _, _ = pq_world
    out = ivfpq_search(
        corpus, corpus.filter("id <= 2"), "id", "emb",
        dim=8, n_cells=4, n_probe=4, m=2, k=4, shortlist=25, topk=25,
    )
    rows = out.collect()
    assert rows and all(r["id"] != 99 for r in rows)


def test_text_format_rejects_multi_column_schema():
    ok = StructType([StructField("line", StringType())])
    DataFormat("text", ok)  # single string column: fine
    bad = StructType(
        [StructField("a", StringType()), StructField("b", StringType())]
    )
    with pytest.raises(ValueError, match="one STRING column"):
        DataFormat("text", bad)


def test_text_format_rejects_multi_column_write(spark, tmp_path):
    fmt = DataFormat("text")
    with pytest.raises(ValueError, match="one STRING column"):
        fmt.write(
            spark.createDataFrame([("x", "y")], "a string, b string"),
            str(tmp_path / "t"),
        )
    # single string column round-trips
    fmt.write(
        spark.createDataFrame([("hello",), ("world",)], "line string"),
        str(tmp_path / "ok"),
    )
    got = {
        r["value"]
        for r in spark.read.format("text").load(str(tmp_path / "ok")).collect()
    }
    assert got == {"hello", "world"}
