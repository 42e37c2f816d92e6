"""Load modes + atomic partition-overwrite protocol."""

import os

import pytest
from pyspark.sql import Row

from m3d_engine_spark.sources.writers import AtomicWriter, LoadMode
from tests.conftest import multiset_equal


def _write(spark, tmp, rows, partition_cols, mode, **kw):
    w = AtomicWriter(spark, tmp, partition_columns=partition_cols, **kw)
    w.write(spark.createDataFrame(rows), mode)
    return spark.read.parquet(tmp)


def test_overwrite_table(spark, tmp_path):
    tgt = str(tmp_path / "t")
    _write(spark, tgt, [Row(a=1)], [], LoadMode.OVERWRITE_TABLE)
    out = _write(spark, tgt, [Row(a=2)], [], LoadMode.OVERWRITE_TABLE)
    assert [r.a for r in out.collect()] == [2]


def test_overwrite_partitions_replaces_only_affected(spark, tmp_path):
    tgt = str(tmp_path / "t")
    _write(
        spark, tgt,
        [Row(k=1, year=2016), Row(k=2, year=2017)],
        ["year"], LoadMode.OVERWRITE_TABLE,
    )
    out = _write(spark, tgt, [Row(k=99, year=2017)], ["year"], LoadMode.OVERWRITE_PARTITIONS)
    rows = {r.year: r.k for r in out.collect()}
    assert rows == {2016: 1, 2017: 99}


def test_overwrite_partitions_with_added_columns(spark, tmp_path):
    tgt = str(tmp_path / "t")
    _write(
        spark, tgt,
        [Row(k=1, extra="e", year=2016)],
        ["year"], LoadMode.OVERWRITE_TABLE,
    )
    # new data lacks `extra` → padded with NULL to the on-disk schema
    out = _write(
        spark, tgt, [Row(k=5, year=2016)], ["year"],
        LoadMode.OVERWRITE_PARTITIONS_WITH_ADDED_COLUMNS,
    )
    r = out.collect()[0]
    assert (r.k, r.extra, r.year) == (5, None, 2016)


def test_append_union_partitions(spark, tmp_path):
    tgt = str(tmp_path / "t")
    _write(spark, tgt, [Row(k=1, year=2016), Row(k=2, year=2017)], ["year"], LoadMode.OVERWRITE_TABLE)
    out = _write(spark, tgt, [Row(k=3, year=2017)], ["year"], LoadMode.APPEND_UNION_PARTITIONS)
    expected = spark.createDataFrame([Row(k=1, year=2016), Row(k=2, year=2017), Row(k=3, year=2017)])
    assert multiset_equal(out.select("k", "year"), expected)


def test_append_join_partitions(spark, tmp_path):
    tgt = str(tmp_path / "t")
    _write(spark, tgt, [Row(k=1, a="old", year=2016)], ["year"], LoadMode.OVERWRITE_TABLE)
    out = _write(
        spark, tgt, [Row(k=1, b="new", year=2016)], ["year"], LoadMode.APPEND_JOIN_PARTITIONS
    )
    r = out.collect()[0]
    assert (r.k, r.a, r.b) == (1, "old", "new")


def test_output_files_num_controls_file_count(spark, tmp_path):
    tgt = str(tmp_path / "t")
    _write(
        spark, tgt, [Row(a=i) for i in range(100)], [],
        LoadMode.OVERWRITE_TABLE, output_files_num=3,
    )
    files = [f for f in os.listdir(tgt) if f.endswith(".parquet")]
    assert len(files) == 3


def test_empty_string_partition_value_commits(spark, tmp_path):
    """Spark writes '' partition values as __HIVE_DEFAULT_PARTITION__;
    the rename-based commit must target that directory, not 'col='
    (which raised FileNotFoundException mid-commit, or silently
    dropped the rows where rename returns false)."""
    tgt = str(tmp_path / "t")
    _write(
        spark, tgt,
        [Row(k=1, cust="a"), Row(k=2, cust="")],
        ["cust"], LoadMode.OVERWRITE_TABLE,
    )
    out = _write(
        spark, tgt, [Row(k=9, cust="")], ["cust"],
        LoadMode.OVERWRITE_PARTITIONS,
    )
    rows = {r.k: r.cust for r in out.collect()}
    # '' comes back as NULL (Hive default-partition round-trip)
    assert rows == {1: "a", 9: None}


def test_union_append_preserves_on_disk_only_columns(spark, tmp_path):
    """A batch missing a column that exists on disk must not destroy
    that column's data in the rewritten partitions."""
    tgt = str(tmp_path / "t")
    _write(
        spark, tgt,
        [Row(k=1, year=2016, address="x")],
        ["year"], LoadMode.OVERWRITE_TABLE,
    )
    df = spark.createDataFrame([Row(k=2, year=2016)])
    AtomicWriter(spark, tgt, partition_columns=["year"]).write(
        df, LoadMode.APPEND_UNION_PARTITIONS
    )
    rows = {r.k: r.address for r in spark.read.parquet(tgt).collect()}
    assert rows == {1: "x", 2: None}


def test_affected_criteria_delete_emptied_partition(spark, tmp_path):
    """A CDC delta that deletes every row of a partition produces zero
    output rows there; passing the delta's criteria must still rewrite
    (i.e. remove) the partition instead of leaving its stale rows."""
    tgt = str(tmp_path / "t")
    _write(
        spark, tgt,
        [Row(k=1, year=2016), Row(k=2, year=2017)],
        ["year"], LoadMode.OVERWRITE_TABLE,
    )
    merged = spark.createDataFrame([Row(k=99, year=2017)])
    AtomicWriter(spark, tgt, partition_columns=["year"]).write(
        merged,
        LoadMode.OVERWRITE_PARTITIONS,
        affected=[[("year", 2016)], [("year", 2017)]],
    )
    rows = {r.year: r.k for r in spark.read.parquet(tgt).collect()}
    assert rows == {2017: 99}  # 2016 emptied, not stale
