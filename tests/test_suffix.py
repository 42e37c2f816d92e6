"""Pins for the exact suffix-ordering tier (operators/suffix.py).

The contract: exact_substr_dedup is remove_repeated_spans with the md5
window fingerprint replaced by prefix-doubling equality classes — on
any collision-free corpus the two are row-identical (the equivalence
pin below), and the exact version cannot collide by construction.
exact_substr_spans is the paper's reporting view: maximal repeated
intervals, canonical site included.
"""

import pytest

from m3d_engine_spark.operators.dedup import remove_repeated_spans
from m3d_engine_spark.operators.suffix import (
    exact_substr_dedup,
    exact_substr_spans,
    suffix_window_classes,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rep = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    return spark.createDataFrame(
        [
            (1, f"{rep} iota kappa"),
            (2, f"lead in {rep} out"),
            (3, "nothing here repeats across documents at all today"),
            (4, f"{rep} iota kappa"),  # doc 1 verbatim
            (5, "alpha beta gamma delta epsilon zeta eta"),  # 7 < L
            (6, "tiny"),
            (7, ""),
        ],
        "doc_id int, text string",
    )


@pytest.mark.slow
@pytest.mark.parametrize("L", [8, 5, 3])
def test_exact_substr_matches_md5_formulation(spark, corpus, L):
    got = sorted(
        exact_substr_dedup(corpus, "doc_id", "text", span_tokens=L).collect()
    )
    want = sorted(
        remove_repeated_spans(corpus, "doc_id", "text", span_tokens=L).collect()
    )
    assert got == want


def test_exact_substr_semantics(spark, corpus):
    rows = {
        r.doc_id: r
        for r in exact_substr_dedup(
            corpus, "doc_id", "text", span_tokens=8
        ).collect()
    }
    # doc 1 is the canonical (minimum doc,pos) copy: untouched
    assert rows[1].n_removed == 0
    # doc 4 repeats doc 1 verbatim (8-token run + "iota kappa" = 10
    # tokens, all inside repeated 8-windows): fully stripped
    assert rows[4].clean_text == "" and rows[4].n_removed == 10
    # doc 2 contains the repeated 8-token run mid-document: only the
    # run is stripped, the unique frame survives
    assert rows[2].clean_text == "lead in out" and rows[2].n_removed == 8
    # a 7-token repeat is BELOW the length threshold: suffix truncation
    # classes must not conflate it with the full 8-token run
    assert rows[5].n_removed == 0
    assert rows[6].n_removed == 0 and rows[7].n_tokens == 0


def test_exact_substr_spans_maximal_intervals(spark, corpus):
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in exact_substr_spans(
            corpus, "doc_id", "text", span_tokens=8
        ).collect()
    )
    # Repeated region reported at EVERY site (canonical included), one
    # maximal interval per run: docs 1/4 repeat verbatim end-to-end
    # (all 10 tokens), doc 2 holds only the 8-token core at 2-9.
    # Docs 3/5/6/7 report nothing.
    assert spans == [(1, 0, 9, 10), (2, 2, 9, 8), (4, 0, 9, 10)]


def test_spans_merge_arbitrary_length_runs(spark):
    """A 12-token repeated region is ONE 12-long interval, not five
    8-windows — the fixed-window truncation the suffix view removes."""
    run = "a b c d e f g h i j k l"  # 12 tokens
    docs = spark.createDataFrame(
        [(1, f"{run} unique1 unique2"), (2, f"pre {run}")],
        "doc_id int, text string",
    )
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in exact_substr_spans(
            docs, "doc_id", "text", span_tokens=8
        ).collect()
    )
    assert spans == [(1, 0, 11, 12), (2, 1, 12, 12)]


def test_suffix_window_classes_exact_equality(spark):
    """Classes are equal exactly on equal window text — including the
    adversarial case md5 can never pin: equality is decided on the
    token lattice itself."""
    from pyspark.sql import functions as F

    from m3d_engine_spark.functions.text import tokens

    docs = spark.createDataFrame(
        [(1, "x y z w x y z w"), (2, "x y z w q r s t")],
        "doc_id int, text string",
    )
    base = docs.select("doc_id", tokens(F.col("text")).alias("_tk"))
    cls = suffix_window_classes(base, "doc_id", span_tokens=4).collect()
    by_pos = {(r.doc_id, r._pos): r._cls for r in cls}
    # doc 1 positions 0 and 4 hold the same 4-gram "x y z w", as does
    # doc 2 position 0
    assert by_pos[(1, 0)] == by_pos[(1, 4)] == by_pos[(2, 0)]
    # overlapping shifted windows differ
    assert by_pos[(1, 0)] != by_pos[(1, 1)]
    # same head, different tail ("x y z w" vs window at doc2 pos 1
    # "y z w q") differ
    assert by_pos[(2, 0)] != by_pos[(2, 1)]
    # only full windows appear
    assert all(p + 4 <= 8 for (_, p) in by_pos)


def test_exact_substr_min_occurrences_dial(spark, corpus):
    """min_occurrences=3: only the core 8-token window occurs at three
    sites (docs 1, 2, 4) — the windows spilling into doc 1/4's "iota
    kappa" tail occur twice and now stay, so exactly 8 tokens strip at
    each non-canonical site; a min of 4 strips nothing."""
    rows3 = {
        r.doc_id: r.n_removed
        for r in exact_substr_dedup(
            corpus, "doc_id", "text", span_tokens=8, min_occurrences=3
        ).collect()
    }
    assert rows3[4] == 8 and rows3[2] == 8 and rows3[1] == 0
    rows4 = exact_substr_dedup(
        corpus, "doc_id", "text", span_tokens=8, min_occurrences=4
    ).collect()
    assert all(r.n_removed == 0 for r in rows4)


@pytest.mark.slow
def test_deep_cascade_paper_scale_L50(spark):
    """Lee et al.'s production threshold is 50 tokens — a 5-round
    cascade (4-gram seed -> 8 -> 16 -> 32 -> overlap to 50). Pins the
    deep-doubling path: equivalence with the md5 formulation, and the
    sub-threshold boundary (a 49-token repeat stays)."""
    rep50 = " ".join(f"t{i}" for i in range(50))
    rep49 = " ".join(f"u{i}" for i in range(49))
    docs = spark.createDataFrame(
        [
            (1, f"{rep50} onlyone"),
            (2, f"head {rep50}"),
            (3, f"{rep49} single"),
            (4, f"pre {rep49}"),
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r
        for r in exact_substr_dedup(
            docs, "doc_id", "text", span_tokens=50
        ).collect()
    }
    assert got[1].n_removed == 0  # canonical
    assert got[2].n_removed == 50 and got[2].clean_text == "head"
    # 49-token repeats are below threshold on BOTH sides
    assert got[3].n_removed == 0 and got[4].n_removed == 0
    want = sorted(
        remove_repeated_spans(
            docs, "doc_id", "text", span_tokens=50
        ).collect()
    )
    assert sorted(got.values()) == want


def test_exact_decontaminate(spark):
    """Benchmark text is scrubbed from every train occurrence (no
    canonical exception — unlike dedup, the benchmark copy is not a
    keeper); clean documents pass through untouched; a probe run
    shorter than L never triggers."""
    from m3d_engine_spark.operators.suffix import exact_decontaminate

    bench8 = "q w e r t y u i"  # 8 tokens
    short7 = "a b c d e f g"   # 7 tokens < L
    train = spark.createDataFrame(
        [
            (1, f"pre {bench8} post"),
            (2, f"{bench8} {bench8}"),   # two hits in one doc
            (3, "totally clean text with nothing shared at all"),
            (4, f"holds {short7} only"),
        ],
        "doc_id int, text string",
    )
    probes = spark.createDataFrame(
        [(100, f"question {bench8} answer"), (101, short7)],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r
        for r in exact_decontaminate(
            train, "doc_id", "text", probes, "doc_id", "text", span_tokens=8
        ).collect()
    }
    assert got[1].clean_text == "pre post" and got[1].n_removed == 8
    assert got[2].clean_text == "" and got[2].n_removed == 16
    assert got[3].n_removed == 0
    # the 7-token probe is below the span threshold: no removal
    assert got[4].n_removed == 0
    assert set(got) == {1, 2, 3, 4}  # probes are not in the output


@pytest.mark.slow
def test_artifact_decontaminate_equals_exact(spark):
    """The production artifact path (materialize benchmark hashes once,
    scrub via broadcast md5 join) equals the exact suffix path on a
    collision-free corpus."""
    from m3d_engine_spark.operators.suffix import (
        decontaminate_with_artifact,
        exact_decontaminate,
        probe_gram_artifact,
    )

    bench = "m n o p q r s t"
    train = spark.createDataFrame(
        [(1, f"keep {bench} drop"), (2, "clean through and through"),
         (3, f"{bench} {bench}")],
        "doc_id int, text string",
    )
    probes = spark.createDataFrame(
        [(9, f"x {bench} y"), (10, "a b c")], "doc_id int, text string"
    )
    art = probe_gram_artifact(probes, "text", span_tokens=8)
    got = sorted(
        decontaminate_with_artifact(
            train, "doc_id", "text", art, span_tokens=8
        ).collect()
    )
    want = sorted(
        exact_decontaminate(
            train, "doc_id", "text", probes, "doc_id", "text", span_tokens=8
        ).collect()
    )
    assert got == want
    assert [r.n_removed for r in got] == [8, 0, 16]


@pytest.mark.slow
def test_decontaminate_cli_artifact_roundtrip(spark, tmp_path):
    """materialize_probe_artifact -> probe_artifact_location chain via
    the CLI: output equals the direct exact run."""
    import json

    from m3d_engine_spark.operators.base import run_algorithm
    from m3d_engine_spark.operators.suffix import exact_decontaminate

    bench = "m n o p q r s t"
    train_loc, probe_loc = str(tmp_path / "train"), str(tmp_path / "probe")
    spark.createDataFrame(
        [(1, f"pre {bench} post"), (2, "nothing shared here at all")],
        "doc_id int, text string",
    ).write.parquet(train_loc)
    spark.createDataFrame(
        [(9, f"q: {bench} a")], "doc_id int, text string"
    ).write.parquet(probe_loc)

    art_loc = str(tmp_path / "artifact")
    p1 = tmp_path / "p1.json"
    p1.write_text(json.dumps({
        "materialize_probe_artifact": True,
        "probe_location": probe_loc,
        "span_tokens": 8,
        "target_location": art_loc,
    }))
    run_algorithm(spark, "Decontaminate", str(p1))
    art = spark.read.parquet(art_loc)
    assert art.columns == ["gh"] and art.count() == 3  # 10-token probe

    out = str(tmp_path / "scrubbed")
    p2 = tmp_path / "p2.json"
    p2.write_text(json.dumps({
        "source_location": train_loc,
        "probe_artifact_location": art_loc,
        "span_tokens": 8,
        "target_location": out,
    }))
    run_algorithm(spark, "Decontaminate", str(p2))
    got = sorted(spark.read.parquet(out).collect())
    want = sorted(
        exact_decontaminate(
            spark.read.parquet(train_loc), "doc_id", "text",
            spark.read.parquet(probe_loc), "doc_id", "text", span_tokens=8,
        ).collect()
    )
    assert got == want
