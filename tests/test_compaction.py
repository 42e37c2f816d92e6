"""Small-files compaction: layout-only rewrite, atomicity, sizing."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from m3d_engine_spark.sources.compaction import (
    compact_table,
    plan_file_count,
)


def _data_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
        if "__tmp" not in f and "__bak" not in f
    ]


def test_plan_file_count_clamps():
    assert plan_file_count(0, 128) == 1
    assert plan_file_count(1000, 100) == 10
    assert plan_file_count(1001, 100) == 11
    assert plan_file_count(10**12, 1, max_files=50) == 50
    try:
        plan_file_count(1, 0)
        raise AssertionError("expected target validation")
    except ValueError:
        pass


def test_compact_table_merges_small_files(spark, tmp_path):
    loc = str(tmp_path / "frag")
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    df.repartition(64).write.parquet(loc)  # fragment: 64 tiny files
    before = _data_files(loc)
    assert len(before) == 64
    total = sum(__import__("os").path.getsize(f) for f in before)
    n = compact_table(spark, loc, target_file_bytes=total // 4 + 1)
    after = _data_files(loc)
    assert len(after) == n <= 5
    # layout-only: exact same rows
    back = spark.read.parquet(loc)
    assert back.count() == 20_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(20_000))
    # no temp/backup litter
    assert not glob.glob(f"{loc}__tmp*") and not glob.glob(f"{loc}__bak*")


def test_compact_partitioned_respects_target_with_salt(spark, tmp_path):
    """A small target must yield MULTIPLE files per partition dir (the
    salted exchange), not one giant file per partition."""
    from m3d_engine_spark.sources.compaction import dir_bytes
    from m3d_engine_spark.sources.dfs import DFS
    import os

    loc = str(tmp_path / "salted")
    df = spark.range(30_000).select(
        F.col("id"), (F.col("id") % 2).alias("p"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(50).write.partitionBy("p").parquet(loc)
    total = dir_bytes(DFS(spark), loc)
    # target 1/8 of total over 2 partitions -> ~4 files per partition
    compact_table(spark, loc, target_file_bytes=total // 8,
                  partition_columns=["p"])
    per_part: dict[str, int] = {}
    for f in _data_files(loc):
        part = "p=0" if "/p=0/" in f else "p=1"
        per_part[part] = per_part.get(part, 0) + 1
    assert set(per_part) == {"p=0", "p=1"}
    assert all(2 <= n <= 8 for n in per_part.values()), per_part
    assert spark.read.parquet(loc).count() == 30_000


def test_compact_skew_aware_scales_files_to_partition_size(spark, tmp_path):
    """skew_aware: a partition with ~9x the data gets ~9x the files,
    instead of 9x-oversized files from the uniform estimate."""
    loc = str(tmp_path / "skewed")
    big = spark.range(45_000).select(
        F.col("id"), F.lit(0).alias("p"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    small = spark.range(5_000).select(
        (F.col("id") + 100_000).alias("id"), F.lit(1).alias("p"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    big.unionByName(small).repartition(40).write.partitionBy("p").parquet(loc)
    from m3d_engine_spark.sources.compaction import dir_bytes
    from m3d_engine_spark.sources.dfs import DFS

    total = dir_bytes(DFS(spark), loc)
    # target ~1/10 of total: uniform planning would give each partition
    # 5 files; skew-aware should give p=0 most of them
    compact_table(spark, loc, target_file_bytes=total // 10,
                  partition_columns=["p"], skew_aware=True)
    per_part: dict[str, int] = {}
    for f in _data_files(loc):
        part = "p=0" if "/p=0/" in f else "p=1"
        per_part[part] = per_part.get(part, 0) + 1
    assert per_part["p=0"] >= 4 * per_part.get("p=1", 1), per_part
    assert spark.read.parquet(loc).count() == 50_000


def test_compact_partitioned_table_keeps_layout(spark, tmp_path):
    loc = str(tmp_path / "part")
    df = spark.range(9_000).select(
        F.col("id"), (F.col("id") % 3).alias("p")
    )
    df.repartition(40).write.partitionBy("p").parquet(loc)
    assert len(_data_files(loc)) >= 40
    compact_table(spark, loc, target_file_bytes=1 << 30,
                  partition_columns=["p"])
    after = _data_files(loc)
    # one file per partition dir at a huge target
    assert len(after) == 3
    assert all("/p=" in f for f in after)
    assert spark.read.parquet(loc).count() == 9_000
