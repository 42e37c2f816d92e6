"""Record linkage semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from m3d_engine_spark.operators.linkage import field_similarity, record_linkage


def test_field_similarity_bounds_and_nulls(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting"), ("same", "same"), (None, "x"), (None, None)],
        "a string, b string",
    )
    vals = df.select(
        F.round(field_similarity(F.col("a"), F.col("b")), 4).alias("s")
    ).collect()
    s = [r.s for r in vals]
    assert s[0] == round(1 - 3 / 7, 4)  # classic kitten/sitting lev=3
    assert s[1] == 1.0
    assert s[2] == 0.0 and s[3] == 0.0


def test_record_linkage_finds_true_match(spark):
    clean = spark.createDataFrame(
        [
            (1, "east", "Acme Corporation", "12 Main Street"),
            (2, "east", "Apex Incorporated", "99 High Road"),
            (3, "west", "Acme Corporation", "12 Main Street"),
        ],
        "id long, region string, name string, addr string",
    )
    dirty = spark.createDataFrame(
        [
            (101, "east", "Acme Corporatoin", "12 Main St"),  # typo'd 1
            (102, "east", "Zenith Ltd", "1 Nowhere"),         # no real match
        ],
        "d long, region string, name string, addr string",
    )
    out = record_linkage(
        dirty, clean, "d", "id", ["region"],
        {"name": 2.0, "addr": 1.0}, threshold=0.6, keep=1,
    )
    rows = {r.d: (r.id, r.rank) for r in out.collect()}
    assert rows == {101: (1, 1)}  # 3 is blocked away (west); 102 below cut


def test_quality_classifier_orders_sensibly(spark):
    from m3d_engine_spark.operators.classifier import score_quality

    prose = (
        "the history of the region shows that trade and agriculture "
        "were the main sources of income for most families there"
    )
    garbage = ")(.,;;;; !!?? ((.,- ,,.. ;;!! ?? ..(( ))-- ..;;"
    docs = spark.createDataFrame(
        [(1, prose), (2, garbage), (3, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in
            score_quality(docs, "doc_id", "text").collect()}
    assert rows[1].score > rows[2].score
    assert rows[1].label == 1 and rows[2].label == 0
    assert 0.0 < rows[3].score < 1.0  # empty text scores, never errors
    # weight override changes the score, unknown features are rejected
    alt = {r.doc_id: r.score for r in score_quality(
        docs, "doc_id", "text", weights={"punct_ratio": 0.0}
    ).collect()}
    assert alt[2] > rows[2].score
    try:
        score_quality(docs, "doc_id", "text", weights={"bogus": 1.0})
        raise AssertionError("expected unknown-weight rejection")
    except ValueError:
        pass


def test_record_linkage_entry_recovers_all_sources(spark, sf_dir):
    """Every dirtied customer must link back to its own source row as
    rank 1 (name lev=1 beats any other same-nation candidate's >=2)."""
    import __spark_entry__ as m

    out = m.queries()["record_linkage"](spark, sf_dir).collect()
    assert len(out) > 0
    assert all(r.d_id - 9000000 == r.c_custkey and r.rank == 1 for r in out)


def test_record_linkage_salted_equals_unsalted(spark):
    """Hot-block salting (bigger side salted, smaller side replicated,
    per-block choice from the broadcast count relation) must return the
    exact unsalted output — including blocks where LEFT is bigger,
    blocks where RIGHT is bigger, and cold blocks."""
    from m3d_engine_spark.operators.linkage import record_linkage

    left = spark.createDataFrame(
        # block b1: left-heavy (6 vs 2); block b2: right-heavy (2 vs 6);
        # block b3: cold (1 vs 1)
        [(i, "b1", f"alice smith {i % 3}") for i in range(6)]
        + [(10, "b2", "bob jones"), (11, "b2", "bob jonez")]
        + [(20, "b3", "carol white")],
        "lid long, blk string, name string",
    )
    right = spark.createDataFrame(
        [(100, "b1", "alice smith 0"), (101, "b1", "alice smith 1")]
        + [(200 + i, "b2", f"bob jone{i}") for i in range(6)]
        + [(300, "b3", "carol whyte")],
        "rid long, blk string, name string",
    )
    kw = dict(
        left_id="lid", right_id="rid", block_cols=["blk"],
        fields={"name": 1.0}, threshold=0.5, keep=3,
    )
    plain = {
        (r.lid, r.rid, r.score, r.rank)
        for r in record_linkage(left, right, **kw).collect()
    }
    salted = {
        (r.lid, r.rid, r.score, r.rank)
        for r in record_linkage(
            left, right, **kw, salt_size=3, salt_parts=4
        ).collect()
    }
    assert salted == plain and plain


def test_fastss_salted_equals_unsalted(spark):
    """k identical strings = k-row buckets on every variant key; the
    salted self-join must return the identical deduped pair set."""
    from m3d_engine_spark.operators.linkage import fastss_pairs

    rows = [(i, "kitten") for i in range(8)]  # identical-string hot keys
    rows += [(20, "kitte"), (21, "sitten"), (22, "mitten"), (30, "zebra")]
    df = spark.createDataFrame(rows, "id long, s string")
    key = lambda r: (r.id_a, r.id_b, r.str_a, r.str_b, r.dist)  # noqa: E731
    plain = {key(r) for r in fastss_pairs(df, "id", "s").collect()}
    salted = {
        key(r)
        for r in fastss_pairs(df, "id", "s", salt_size=3, salt_parts=4).collect()
    }
    assert salted == plain
    # the 8 identical strings pair completely; typo neighbours attach
    assert sum(a < 8 and b < 8 for a, b, *_ in plain) == 8 * 7 / 2
