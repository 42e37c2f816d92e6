"""Temporal join operators: as-of join and bucketed range join.

Correctness is pinned against the naive (non-scalable) formulations on
small data; plan shape is pinned so the scale topology can't silently
regress — asof must stay a join-free window plan, the range join an
equi-join (never BroadcastNestedLoop)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from m3d_engine_spark.operators.temporal import asof_join, bucketed_range_join


def _plan(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def _events(spark):
    rows = []
    for u in range(4):
        for i in range(12):
            rows.append(Row(k=u, t=i * 10 + u, kind="obs" if i % 3 else "ref",
                            v=float(u * 100 + i)))
    return spark.createDataFrame(rows)


def test_asof_backward_matches_naive(spark):
    df = _events(spark)
    left = df.filter(F.col("kind") == "obs").select("k", "t", "v")
    right = df.filter(F.col("kind") == "ref").select(
        "k", F.col("t").alias("rt"), F.col("v").alias("rv")
    )
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="rt",
                    value_cols=["rv"])
    got = {(r.k, r.t): (r._matched_ts, r.rv) for r in out.collect()}
    # Naive per-row max-ts-at-or-before reference.
    refs = {}
    for r in right.collect():
        refs.setdefault(r.k, []).append((r.rt, r.rv))
    for r in left.collect():
        cands = [(rt, rv) for rt, rv in refs.get(r.k, []) if rt <= r.t]
        want = max(cands) if cands else (None, None)
        assert got[(r.k, r.t)] == want, (r.k, r.t, got[(r.k, r.t)], want)
    assert len(got) == left.count()


def test_asof_forward_and_unmatched(spark):
    left = spark.createDataFrame([Row(k=1, t=5), Row(k=1, t=50), Row(k=2, t=5)])
    right = spark.createDataFrame([Row(k=1, rt=10, rv="a"), Row(k=1, rt=40, rv="b")])
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="rt",
                    value_cols=["rv"], direction="forward")
    got = {(r.k, r.t): (r._matched_ts, r.rv) for r in out.collect()}
    assert got[(1, 5)] == (10, "a")    # next ref at/after t=5
    assert got[(1, 50)] == (None, None)  # nothing after
    assert got[(2, 5)] == (None, None)   # key never seen on the right


def test_asof_inclusive_tie(spark):
    left = spark.createDataFrame([Row(k=1, t=10)])
    right = spark.createDataFrame([Row(k=1, rt=10, rv="same-ts")])
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="rt",
                    value_cols=["rv"])
    assert out.collect()[0].rv == "same-ts"  # l.ts >= r.ts is inclusive


def test_asof_plan_is_join_free_single_exchange(spark):
    """The 100 TB property: no join operator at all — one hash exchange
    on the key feeding a window, all whole-stage codegen."""
    df = _events(spark)
    left = df.filter(F.col("kind") == "obs").select("k", "t", "v")
    right = df.filter(F.col("kind") == "ref").select(
        "k", F.col("t").alias("rt"), F.col("v").alias("rv")
    )
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="rt",
                    value_cols=["rv"])
    plan = _plan(out, "simple")  # simple mode: each node appears once
    assert "Join" not in plan, "asof_join must not plan a join"
    assert plan.count("Exchange") == 1, plan
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_range_join_matches_naive_and_avoids_bnlj(spark):
    left = spark.createDataFrame(
        [Row(k=u, p=u * 7 + i * 13) for u in range(3) for i in range(20)]
    )
    right = spark.createDataFrame(
        [Row(k=u, s=u * 11 + j * 40, e=u * 11 + j * 40 + 25)
         for u in range(3) for j in range(5)]
    )
    out = bucketed_range_join(
        left, right, on=["k"], left_point="p", right_start="s", right_end="e",
        bucket_width=30,
        point_to_long=F.col("p"), start_to_long=F.col("s"), end_to_long=F.col("e"),
    )
    got = sorted((r.k, r.p, r.s, r.e) for r in out.collect())
    # Collect ONCE — a df.collect() in the inner comprehension clause
    # re-runs the Spark job once per outer row (60 jobs, ~12 s).
    lrows, rrows = left.collect(), right.collect()
    naive = sorted(
        (lr.k, lr.p, rr.s, rr.e)
        for lr in lrows for rr in rrows
        if lr.k == rr.k and rr.s <= lr.p <= rr.e
    )
    assert got == naive and len(naive) > 0
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
