"""Regression tests for the round-8 ADVICE findings.

Pins: (1) ``explode_arrays`` on a nested array that is its parent
struct's ONLY field — ``dropFields`` raises CANNOT_DROP_ALL_FIELDS
there, so the flattener must drop at the deepest ancestor that keeps a
sibling (whole top-level column when the struct is just the one
chain); (2) empty-string partition values are canonicalized to None by
``collect_partitions`` (Spark writes '' and NULL to the same
``__HIVE_DEFAULT_PARTITION__`` directory and reads both back as NULL),
``partition_predicate`` matches the default partition for '' criteria,
and ``AtomicWriter`` dedupes criteria that alias one rel path instead
of aborting on the second backup rename; (3) ``write_output``'s
emptied-partition cleanup drops NULL (Hive default) partitions via the
metastore sentinel instead of skipping them — a CDC delta that empties
the NULL partition must not leave its stale rows behind.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.nested_flattener import explode_arrays
from m3d_engine_spark.plans.partitions import (
    collect_partitions,
    partition_predicate,
)
from m3d_engine_spark.sources.writers import AtomicWriter, LoadMode, write_output


# ---------------------------------------------------------------- (1)
def test_explode_arrays_sole_field_struct_drops_parent(spark):
    df = spark.createDataFrame(
        [Row(id=1, meta=Row(tags=["a", "b"]))],
    )
    out = explode_arrays(df, ["meta.tags"])
    assert "meta" not in out.columns
    assert sorted(r.meta__tags for r in out.collect()) == ["a", "b"]


def test_explode_arrays_sole_field_nested_two_deep(spark):
    # a.b.c where c is b's only field but b has a sibling in a:
    # b (now empty) must go, the sibling must survive
    df = spark.createDataFrame(
        [Row(id=1, a=Row(b=Row(c=[1, 2]), keep="x"))],
    )
    out = explode_arrays(df, ["a.b.c"])
    rows = out.collect()
    assert sorted(r.a__b__c for r in rows) == [1, 2]
    assert {r.a.keep for r in rows} == {"x"}
    assert "b" not in out.schema["a"].dataType.fieldNames()


def test_explode_arrays_sibling_still_preserved(spark):
    # the pre-existing contract: siblings survive when dropFields works
    df = spark.createDataFrame(
        [Row(id=1, meta=Row(tags=["a"], lang="en"))],
    )
    out = explode_arrays(df, ["meta.tags"])
    assert out.collect()[0].meta.lang == "en"


def test_explode_arrays_case_insensitive_path_keeps_siblings(spark):
    # the analyzer resolves 'meta.Tags' against field 'tags'; the
    # schema walk must do the same or it silently drops the parent
    df = spark.createDataFrame(
        [Row(id=1, meta=Row(tags=["a"], lang="en"))],
    )
    out = explode_arrays(df, ["meta.Tags"])
    assert out.collect()[0].meta.lang == "en"


def test_explode_arrays_unfollowable_path_fails_loud(spark):
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    # a is array<struct<b,c>>: the walk cannot follow a.b into a
    # struct — must raise (old behavior), never silently drop a's data
    df = spark.createDataFrame(
        [Row(id=1, a=[Row(b=[1], c="keep")])],
    )
    with _pytest.raises(AnalysisException):
        explode_arrays(df, ["a.b"]).schema


# ---------------------------------------------------------------- (2)
def test_collect_partitions_canonicalizes_empty_string(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, ""), (3, None)], "id INT, p STRING"
    )
    crits = collect_partitions(df, ["p"])
    assert sorted(crits, key=str) == [[("p", "x")], [("p", None)]]


def test_partition_predicate_empty_string_matches_default_partition(spark):
    # rows written with p='' come back from disk as NULL; a caller
    # still holding ('p','') criteria must match them
    disk = spark.createDataFrame([(2, None)], "id INT, p STRING")
    hit = disk.filter(partition_predicate([[("p", "")]]))
    assert [r.id for r in hit.collect()] == [2]


def test_atomic_writer_dedupes_aliased_default_partition(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "x"), (2, None)], "id INT, p STRING"
    )
    AtomicWriter(spark, target, ["p"]).write(base, LoadMode.OVERWRITE_TABLE)
    batch = spark.createDataFrame([(3, None)], "id INT, p STRING")
    w = AtomicWriter(spark, target, ["p"])
    # both spellings of the default partition in caller criteria: one
    # backup rename, not an abort on the second
    w.write(
        batch,
        LoadMode.OVERWRITE_PARTITIONS,
        affected=[[("p", None)], [("p", "")]],
    )
    assert w.last_affected == [[("p", None)]]
    got = sorted(
        (r.id, r.p) for r in spark.read.parquet(target).collect()
    )
    assert got == [(1, "x"), (3, None)]


def test_append_union_empty_string_batch_keeps_null_rows(spark, tmp_path):
    # THE ADVICE scenario: an APPEND_UNION batch carrying '' partition
    # values previously collected ('p','') criteria that matched no
    # on-disk rows, then dynamic overwrite replaced the shared default
    # dir — existing NULL-partition rows silently lost in an append
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "x"), (2, None)], "id INT, p STRING"
    )
    AtomicWriter(spark, target, ["p"]).write(base, LoadMode.OVERWRITE_TABLE)
    batch = spark.createDataFrame([(3, "")], "id INT, p STRING")
    AtomicWriter(spark, target, ["p"]).write(
        batch, LoadMode.APPEND_UNION_PARTITIONS
    )
    got = sorted(
        (r.id, r.p) for r in spark.read.parquet(target).collect()
    )
    # row 2 (NULL partition) survives; row 3's '' reads back as NULL
    assert got == [(1, "x"), (2, None), (3, None)]


def test_atomic_writer_roundtrip_adversarial_partition_values(spark, tmp_path):
    # end-to-end commit protocol over values whose escaped directory
    # names differ from the raw strings: the rename-based commit must
    # target exactly the dirs Spark wrote
    values = ["plain", "with space", "q=r", "pct%20", "uni_äöü", None]
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id INT, p STRING"
    )
    AtomicWriter(spark, target, ["p"]).write(base, LoadMode.OVERWRITE_TABLE)
    # overwrite two of the partitions (one escaped, one NULL)
    batch = spark.createDataFrame(
        [(100, "with space"), (101, None)], "id INT, p STRING"
    )
    AtomicWriter(spark, target, ["p"]).write(
        batch, LoadMode.OVERWRITE_PARTITIONS
    )
    got = sorted(
        (r.id, r.p) for r in spark.read.parquet(target).collect()
    )
    expect = sorted(
        [(i, v) for i, v in enumerate(values) if v not in ("with space", None)]
        + [(100, "with space"), (101, None)]
    )
    assert got == expect


# ---------------------------------------------------------------- (3)
def test_write_output_drops_emptied_null_partition(spark):
    table = "t_r9_null_drop"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        spark.createDataFrame(
            [(1, "x"), (2, None)], "id INT, p STRING"
        ).write.partitionBy("p").saveAsTable(table)
        # the delta emptied the NULL partition: affected says it was
        # touched, the frame has no rows for it
        batch = spark.createDataFrame([(9, "x")], "id INT, p STRING")
        write_output(
            spark,
            batch,
            ParamsFile(
                {
                    "target_table": table,
                    "target_partitions": ["p"],
                    "load_mode": "OverwritePartitions",
                }
            ),
            affected=[[("p", "x")], [("p", None)]],
        )
        spark.catalog.refreshTable(table)
        got = sorted((r.id, r.p) for r in spark.table(table).collect())
        assert got == [(9, "x")], "stale NULL-partition rows survived"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_write_output_empty_string_affected_criterion(spark):
    # caller-supplied ('p','') criteria must canonicalize to the
    # default partition, not feed DROP PARTITION(p='') (an
    # AnalysisException AFTER the insert committed)
    table = "t_r9_empty_drop"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        spark.createDataFrame(
            [(1, "x"), (2, None)], "id INT, p STRING"
        ).write.partitionBy("p").saveAsTable(table)
        batch = spark.createDataFrame([(9, "x")], "id INT, p STRING")
        write_output(
            spark,
            batch,
            ParamsFile(
                {
                    "target_table": table,
                    "target_partitions": ["p"],
                    "load_mode": "OverwritePartitions",
                }
            ),
            affected=[[("p", "x")], [("p", "")]],
        )
        spark.catalog.refreshTable(table)
        got = sorted((r.id, r.p) for r in spark.table(table).collect())
        assert got == [(9, "x")]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
