"""Physical-plan pins: the scale properties SURVEY §4 designs for must
be visible in the plans Catalyst actually produces, not just intended.

Each test asserts on ``explain``-level plan text:
* partition predicates prune at the source (PartitionFilters, not a
  post-scan Filter over all files);
* value filters push into the parquet scan (PushedFilters);
* the small dimension side of a join broadcasts;
* column pruning reaches the scan (ReadSchema carries only used cols);
* hot-path text/dedup expressions stay JVM-side (no BatchEvalPython =
  no row-at-a-time Python UDF in the plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m3d_engine_spark.plans.partitions import partition_predicate


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_partition_predicate_prunes_partitioned_scan(spark, tmp_path):
    """The Column-predicate design (vs the reference's row lambda) must
    yield PartitionFilters on a partitioned parquet scan — the single
    biggest designed-in perf win (SURVEY §4)."""
    loc = str(tmp_path / "pp")
    spark.createDataFrame(
        [(i, i % 3 + 2020) for i in range(100)], "k int, year int"
    ).write.partitionBy("year").parquet(loc)
    df = spark.read.parquet(loc).filter(partition_predicate([[("year", 2021)]]))
    plan = _plan(df)
    # the partition filter must land in the scan's PartitionFilters slot
    # (inputFiles() is pre-pruning, so assert on the plan itself)
    pf = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "year" in pf and "2021" in pf, pf
    assert df.count() == 33  # i % 3 == 1 for i in 0..99


def test_value_filter_pushed_to_parquet(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_quantity") > 45
    ).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_order_revenue_broadcasts_dimension(spark):
    import __spark_entry__ as m

    df = m.queries()["order_revenue"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_text_stats_has_no_python_udf(spark):
    import __spark_entry__ as m

    for name in ("text_stats", "language_id", "exact_dups", "simhash_dedup"):
        plan = _plan(m.queries()[name](spark, "/root/testdata/sf0.001"))
        assert "BatchEvalPython" not in plan, f"{name} fell off the JVM fast path"
        assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF unexpectedly"


def test_pricing_summary_single_shuffle(spark):
    """Q1-shaped agg: one Exchange (partial → final agg), no more."""
    import __spark_entry__ as m

    plan = _plan(m.queries()["pricing_summary"](spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange") <= 2  # shuffle + (AQE may show reused node)
    assert "HashAggregate" in plan
