"""Hive-metastore smoke: the catalog operations against a REAL Hive
(Derby) metastore, not just Spark's in-memory catalog — external
partitioned table DDL, MSCK recovery, DESCRIBE location, per-partition
ANALYZE, and the schema-preserving location swap.

Runs in a subprocess: Hive support must be enabled at session build
and the suite's shared session is in-memory-catalog; a second session
in the same JVM would inherit the wrong catalog implementation.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys, os
sys.path.insert(0, {repo!r})
os.chdir({tmp!r})
from m3d_engine_spark.session import build_session
from m3d_engine_spark.sources import catalog as cat

spark = build_session(
    app_name="hive-smoke", master="local[2]", hive=True,
    extra_conf={{
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": "2",
        "spark.sql.warehouse.dir": {tmp!r} + "/warehouse",
    }},
)
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
spark.sql("CREATE DATABASE IF NOT EXISTS lakedb")
df = spark.createDataFrame([(1, "a", 2020), (2, "b", 2021)], "k int, v string, year int")
loc = {tmp!r} + "/data/t1"
df.write.partitionBy("year").parquet(loc)
spark.sql(
    "CREATE EXTERNAL TABLE lakedb.t1 (k int, v string) "
    f"PARTITIONED BY (year int) STORED AS PARQUET LOCATION '{{loc}}'".format(loc=loc)
)
cat.recover_partitions_native(spark, "lakedb.t1")
assert spark.table("lakedb.t1").count() == 2
assert cat.table_location(spark, "lakedb.t1").endswith("/data/t1")
cat.compute_statistics(
    spark, "lakedb.t1", partition_specs=cat.list_table_partitions(spark, "lakedb.t1")
)
loc2 = {tmp!r} + "/data/t1_v2"
df.write.partitionBy("year").parquet(loc2)
saved = spark.table("lakedb.t1").schema
cat.recreate_table_at_location(spark, "lakedb.t1", loc2, ["year"], schema=saved)
assert spark.table("lakedb.t1").count() == 2
assert cat.table_location(spark, "lakedb.t1").endswith("/data/t1_v2")

# --- round-3 DDL wrappers (CatalogTableManager / OutputWriter parity) ---
# Partition values with special chars + NULL: SHOW PARTITIONS returns
# them path-escaped; list_table_partitions must hand back raw values.
df2 = spark.createDataFrame(
    [(1, "a:b c"), (2, None)], "k int, tag string"
)
loc3 = {tmp!r} + "/data/t2"
df2.write.partitionBy("tag").parquet(loc3)
spark.sql(
    "CREATE EXTERNAL TABLE lakedb.t2 (k int) "
    "PARTITIONED BY (tag string) STORED AS PARQUET LOCATION '" + loc3 + "'"
)
cat.recover_partitions_native(spark, "lakedb.t2")
parts = sorted(cat.list_table_partitions(spark, "lakedb.t2"),
               key=lambda c: (c[0][1] is None, c[0][1]))
assert parts == [[("tag", "a:b c")], [("tag", None)]], parts
# ANALYZE with the unescaped spec must not throw (NULL spec is skipped).
cat.compute_statistics(spark, "lakedb.t2", partition_specs=parts)

# Re-point one partition at a new directory.
newpart = {tmp!r} + "/data/t2_repoint"
spark.createDataFrame([(9,)], "k int").write.parquet(newpart)
cat.set_partition_location(spark, "lakedb.t2", [("tag", "a:b c")], newpart)
cat.refresh_table(spark, "lakedb.t2")
got = [r.k for r in spark.table("lakedb.t2").where("tag = 'a:b c'").collect()]
assert got == [9], got

# Drop every registered partition (data files stay — external table).
assert cat.drop_all_table_partitions(spark, "lakedb.t2") == 2
assert cat.list_table_partitions(spark, "lakedb.t2") == []
assert spark.table("lakedb.t2").count() == 0

# TRUNCATE on a managed table (reference's pre-overwrite cleanup).
spark.createDataFrame([(1,), (2,)], "k int").write.saveAsTable("lakedb.m1")
cat.truncate_table(spark, "lakedb.m1")
assert spark.table("lakedb.m1").count() == 0

print("HIVE_SMOKE_PASS")
spark.stop()
"""


def test_catalog_ops_against_hive_metastore(tmp_path):
    script = SCRIPT.format(repo="/root/repo", tmp=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=280,
    )
    assert "HIVE_SMOKE_PASS" in proc.stdout, (
        f"stdout tail: {proc.stdout[-1500:]}\nstderr tail: {proc.stderr[-1500:]}"
    )
