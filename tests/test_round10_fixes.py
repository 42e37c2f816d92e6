"""Regression tests for the round-9 ADVICE findings.

Pins: (1) ``AtomicWriter`` canonicalizes caller-supplied criteria
('' -> None) BEFORE the rel-path dedupe, so ``last_affected`` — which
append_load/materialization feed into ADD PARTITION / ANALYZE specs —
never carries a ('col','') criterion even when the '' variant wins the
first-seen dedupe; (2) ``write_output``'s emptied-partition cleanup
also handles a NULL partition on a NON-STRING (integer) partition
column — the framework's common year/month case — and a post-commit
DROP PARTITION failure downgrades to a warning instead of failing the
load after the insert already committed.
"""

import logging

import pytest

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.sources.writers import AtomicWriter, LoadMode, write_output


# ---------------------------------------------------------------- (1)
def test_atomic_writer_last_affected_is_canonical(spark, tmp_path):
    target = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "x")], "id INT, p STRING")
    writer = AtomicWriter(spark, target, partition_columns=["p"])
    # '' listed FIRST so it wins the setdefault if not canonicalized
    writer.write(
        df,
        LoadMode.OVERWRITE_PARTITIONS,
        affected=[[("p", "")], [("p", None)], [("p", "x")]],
    )
    crits = {tuple(c) for c in writer.last_affected}
    assert crits == {(("p", None),), (("p", "x"),)}, crits


# ---------------------------------------------------------------- (2)
def test_write_output_drops_emptied_null_partition_int_column(spark):
    # same scenario as test_round9_fixes (3) but with an INTEGER
    # partition column: partition-spec value resolution for the NULL
    # sentinel can differ per catalog for non-string types
    table = "t_r10_null_drop_int"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        spark.createDataFrame(
            [(1, 2024), (2, None)], "id INT, yr INT"
        ).write.partitionBy("yr").saveAsTable(table)
        batch = spark.createDataFrame([(9, 2024)], "id INT, yr INT")
        write_output(
            spark,
            batch,
            ParamsFile(
                {
                    "target_table": table,
                    "target_partitions": ["yr"],
                    "load_mode": "OverwritePartitions",
                }
            ),
            affected=[[("yr", 2024)], [("yr", None)]],
        )
        spark.catalog.refreshTable(table)
        got = sorted((r.id, r.yr) for r in spark.table(table).collect())
        assert got == [(9, 2024)], "stale NULL-partition rows survived"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_write_output_post_commit_drop_failure_does_not_fail_load(
    spark, monkeypatch, caplog
):
    # a metastore DROP PARTITION failure after the insert committed
    # must warn, not raise — the data is already live
    table = "t_r10_drop_guard"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        spark.createDataFrame(
            [(1, "x"), (2, None)], "id INT, p STRING"
        ).write.partitionBy("p").saveAsTable(table)
        batch = spark.createDataFrame([(9, "x")], "id INT, p STRING")

        from pyspark.errors import AnalysisException

        real_sql = spark.sql

        def flaky_sql(q, *a, **kw):
            if "DROP IF EXISTS PARTITION" in q:
                raise AnalysisException("simulated metastore failure")
            return real_sql(q, *a, **kw)

        monkeypatch.setattr(spark, "sql", flaky_sql)
        params = ParamsFile(
            {
                "target_table": table,
                "target_partitions": ["p"],
                "load_mode": "OverwritePartitions",
            }
        )
        with caplog.at_level(logging.WARNING, logger="m3d_engine_spark.sources.writers"):
            failed = write_output(
                spark, batch, params, affected=[[("p", "x")], [("p", None)]]
            )
        monkeypatch.undo()
        spark.catalog.refreshTable(table)
        # the insert committed; only the cleanup was skipped, so the
        # emptied NULL partition's stale row survives under the guard
        got = sorted((r.id, r.p) for r in spark.table(table).collect())
        assert (9, "x") in got
        # the failure is a structured WARNING plus a returned spec the
        # caller can retry — not a bare print
        assert any("post-commit DROP" in r.message for r in caplog.records)
        assert failed and len(failed) == 1 and "__HIVE_DEFAULT_PARTITION__" in failed[0]

        # a NON-metastore error class (programming error: typo, closed
        # session) must NOT be swallowed by the narrowed catch
        def broken_sql(q, *a, **kw):
            if "DROP IF EXISTS PARTITION" in q:
                raise TypeError("programming error")
            return real_sql(q, *a, **kw)

        monkeypatch.setattr(spark, "sql", broken_sql)
        batch2 = spark.createDataFrame([(10, "x")], "id INT, p STRING")
        with pytest.raises(TypeError):
            write_output(
                spark, batch2, params, affected=[[("p", "x")], [("p", None)]]
            )
        monkeypatch.undo()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
