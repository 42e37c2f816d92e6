"""Regression tests for the round-5 ADVICE findings.

Each test pins the exact failure mode the advisor reported:
short-doc bigram crashes under ANSI, 9-hex-digit split boundaries,
zero-frame fan-out, int-typed event-time misread as epoch-ns, and
star-CC returning fabricated components on a truncated loop.
"""

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType

from m3d_engine_spark.functions.epoch import as_timestamp, epoch_us
from m3d_engine_spark.operators.collocations import pmi_bigrams
from m3d_engine_spark.operators.graph import connected_components_star
from m3d_engine_spark.operators.sampling import hash_split, split_boundaries


def test_pmi_bigrams_short_and_empty_docs(spark):
    # ADVICE medium: docs with <2 tokens made sequence(1, size-1)
    # descend and t[-1]/t[1] abort under ANSI mode.
    docs = spark.createDataFrame(
        [("",), ("solo",), ("a b a b",), ("a b",)], ["text"]
    )
    out = pmi_bigrams(docs, "text", min_count=1, top=10).collect()
    pairs = {(r.w1, r.w2): r.n_pair for r in out}
    assert pairs[("a", "b")] == 3
    assert pairs[("b", "a")] == 1
    # the empty and single-token docs contribute nothing, not a crash
    assert sum(pairs.values()) == 4


def test_split_boundaries_clamped_to_8_hex_digits():
    # ADVICE low: trailing-zero weight pushed a non-final cumulative
    # fraction to 1.0 → 9-digit '100000000' broke the lexicographic
    # compare. Zero/negative weights are now rejected outright.
    with pytest.raises(ValueError):
        split_boundaries([0.7, 0.3, 0.0])
    with pytest.raises(ValueError):
        split_boundaries([1.0, -0.1])
    for bounds in (
        split_boundaries([0.7, 0.3]),
        split_boundaries([1e-9, 1.0]),
        split_boundaries([1.0, 1e-12, 1e-12]),
    ):
        assert all(len(b) == 8 for b in bounds), bounds


def test_hash_split_tiny_tail_weight(spark):
    # Even with float rounding driving a bound to ~2^32, every row must
    # land in a valid split index.
    df = spark.range(200).withColumnRenamed("id", "k")
    out = hash_split(df, "k", [1.0, 1e-12])
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get(0, 0) == 200  # the 1e-12 split is ~never hit


def test_sample_frames_zero_frame_videos(spark):
    # ADVICE low: n_frames = 0 (corrupt video under a real decoder)
    # made sequence(0, -1, k) raise. Now filtered out pre-explode.
    from m3d_engine_spark.operators.multimodal import sample_frames

    decoded = spark.createDataFrame(
        [(1, "video", "aa" * 32, 0), (2, "video", "bb" * 32, 9),
         (3, "image", "cc" * 32, 1)],
        ["media_id", "media_type", "sha256", "n_frames"],
    )
    rows = sample_frames(decoded, every_k=4).collect()
    assert {r.media_id for r in rows} == {2}
    assert sorted(r.frame_idx for r in rows) == [0, 4, 8]
    expect = hashlib.md5(f"{'bb' * 32}:0".encode()).hexdigest()
    assert [r.frame_sha for r in rows if r.frame_idx == 0] == [expect]


def test_epoch_us_rejects_integer_type():
    # ADVICE low: a 32-bit int can't be epoch-ns; silently dividing a
    # plausible epoch-seconds column by 1000 defeated the raise-don't-
    # guess contract.
    with pytest.raises(TypeError, match="ambiguous"):
        epoch_us(F.col("ts"), IntegerType())
    with pytest.raises(TypeError, match="ambiguous"):
        as_timestamp(F.col("ts"), IntegerType())
    # LongType epoch-ns still accepted
    epoch_us(F.col("ts"), LongType())


@pytest.mark.slow
def test_star_cc_raises_on_truncated_iterations(spark):
    # ADVICE low: exiting the fingerprint loop before the fixpoint used
    # to return internally inconsistent components silently.
    n = 40
    nodes = spark.range(n).withColumnRenamed("id", "id")
    chain = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components_star(nodes, chain, max_iterations=1)
    stats: dict = {}
    out = connected_components_star(nodes, chain, stats=stats)
    assert stats["converged"] and stats["rounds"] <= 8
    assert out.select(F.count_distinct("component")).first()[0] == 1
