"""Round-7 operators: transition census, Benford audit, HITS,
n-gram novelty, LSH calibration."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from m3d_engine_spark.operators.dedup import lsh_calibration, ngram_novelty
from m3d_engine_spark.operators.graph import hits
from m3d_engine_spark.operators.markov import transition_matrix
from m3d_engine_spark.operators.reporting import benford_audit


def test_transition_matrix_known_sequences(spark):
    """Hand-checkable chain: user 1 = a→b→a→c, user 2 = a→b. Counts
    and row-conditional probabilities; the last event of each
    sequence contributes nothing."""
    ev = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
         (2, 1, "a"), (2, 2, "b")],
        "u long, t long, s string",
    )
    out = {(r.from_state, r.to_state): (r.n, r.p) for r in
           transition_matrix(ev, ["u"], "t", "s").collect()}
    assert out == {
        ("a", "b"): (2, 0.6667),  # a→b twice of a's 3 transitions
        ("a", "c"): (1, 0.3333),
        ("b", "a"): (1, 1.0),
    }


def test_transition_matrix_tiebreaker_deterministic(spark):
    """Equal timestamps: the tie column must fix the successor order."""
    ev = spark.createDataFrame(
        [(1, 5, 10, "x"), (1, 5, 11, "y"), (1, 5, 12, "z")],
        "u long, t long, eid long, s string",
    )
    out = {(r.from_state, r.to_state) for r in
           transition_matrix(ev, ["u"], "t", "s", tie_cols=["eid"]).collect()}
    assert out == {("x", "y"), ("y", "z")}


def test_benford_on_benford_distributed_data(spark):
    """2^n for n=0..199 is a classic Benford sequence: every digit's
    chi-square contribution must be tiny, and fractions must track
    log10(1+1/d). Exercises the string-based first-digit extraction on
    huge values too."""
    rows = [(float(2 ** n),) for n in range(200)]
    df = spark.createDataFrame(rows, "v double")
    out = {r.digit: r for r in benford_audit(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    chi2 = sum(r.chi2_part for r in out.values())
    assert chi2 < 16.0, chi2  # chi2(8) 5% critical value is 15.5
    for d, r in out.items():
        assert abs(r.benford_frac - round(math.log10(1 + 1 / d), 6)) < 1e-9
        assert abs(r.obs_frac - r.benford_frac) < 0.03


def test_benford_skips_nulls_and_zeros_handles_fractions(spark):
    df = spark.createDataFrame(
        [(None,), (0.0,), (0.05,), (-317.2,), (0.0001234,)], "v double"
    )
    out = {r.digit: r.n for r in benford_audit(df, "v").collect()}
    # 0.05 → 5, -317.2 → 3, 0.0001234 → 1; null and 0 excluded
    assert out == {5: 1, 3: 1, 1: 1}


def test_hits_bipartite_hand_graph(spark):
    """src 1 points at both popular targets, src 4 at one: node 3 (in
    from everyone) is the top authority, node 1 the top hub; sinks get
    hub 0, sources authority 0. Lattice values are exact longs."""
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5)], "src long, dst long"
    )
    out = {r.node: r for r in hits(e, iterations=3).collect()}
    assert out[3].authority == 1.0 and out[1].hub == 1.0
    assert out[1].authority == 0.0 and out[5].hub == 0.0
    assert out[2].auth_int < out[3].auth_int
    assert all(0 <= r.auth_int <= 10**6 for r in out.values())


def test_hits_deterministic_across_reruns(spark):
    li = spark.createDataFrame(
        [(i % 7, (i * i) % 11 + 100) for i in range(60)],
        "src long, dst long",
    )
    a = sorted(tuple(r) for r in hits(li, iterations=2).collect())
    b = sorted(tuple(r) for r in hits(li, iterations=2).collect())
    assert a == b


def test_ngram_novelty_shared_vs_unique(spark):
    """Doc 1 and 2 share all shingles (novelty 0); doc 3 is all
    fresh (novelty 1); doc 4 mixes."""
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w"),
         (4, "a b c q r s")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(docs, "doc_id", "text").collect()}
    assert out[1].novelty == 0.0 and out[2].novelty == 0.0
    assert out[3].novelty == 1.0
    # doc 4: shingles {abc, bcq, cqr, qrs}; only 'a b c' is shared
    assert out[4].n_shingles == 4 and out[4].n_novel == 3
    assert out[4].novelty == 0.75


def test_lsh_calibration_exact_match_and_bounds(spark):
    """Identical docs must calibrate to est_j = exact_j = 1.0; every
    estimate stays in [0, 1] and errors are |est − exact|."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),
         (3, "the quick brown fox jumps over a sleepy dog today"),
         (4, "completely different text with no overlap at all here")],
        "doc_id long, text string",
    )
    rows = lsh_calibration(docs, "doc_id", "text").collect()
    by_pair = {(r.id_a, r.id_b): r for r in rows}
    assert by_pair[(1, 2)].est_j == 1.0
    assert by_pair[(1, 2)].exact_j == 1.0
    assert by_pair[(1, 2)].abs_err == 0.0
    for r in rows:
        assert 0.0 <= r.est_j <= 1.0 and 0.0 < r.exact_j <= 1.0
        assert r.abs_err == round(abs(r.est_j - r.exact_j), 4)
    # candidate generation is deterministic (md5): only near-dup pairs
    # can appear — the disjoint doc 4 must never pair with anything
    assert set(by_pair) <= {(1, 2), (1, 3), (2, 3)}
    assert not any(4 in p for p in by_pair)
