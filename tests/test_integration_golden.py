"""Golden replay of the reference's three INTEGRATION suites — the
last reference test directory not yet covered:

* RecoverPartitionsCustomIntegrationTest.scala:16 — AppendLoad with
  ``metadata_update_strategy: SparkRecoverPartitionsCustom`` (typed
  ADD PARTITION), asserting table content, SHOW PARTITIONS state,
  per-partition ANALYZE statistics, and header persistence.
* RecoverPartitionsNativeIntegrationTest.scala:16 — same fixture with
  the native (MSCK) strategy.
* FailFastIntegrationTest.scala:28 — FullLoad in FAILFAST reader mode:
  a good load populates table + partitions; a malformed file must fail
  the pipeline while leaving table data AND partition metadata intact.

All three need a real Hive (Derby) metastore (SHOW PARTITIONS /
DESCRIBE ... PARTITION statistics), so they run in ONE subprocess
sharing ONE Hive session (the suite's shared session is
in-memory-catalog), mirroring tests/test_sql_runner_golden.py.
Fixture data is read from the read-only reference checkout at runtime —
never copied into the repo.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REF = "/root/reference/src/test/resources/com/adidas/analytics/integration"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not present"
)

SCRIPT = r"""
import json, os, shutil, sys
sys.path.insert(0, {repo!r})
os.chdir({tmp!r})  # fresh Derby metastore_db per run
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from m3d_engine_spark.session import build_session
from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.append_load import AppendLoad
from m3d_engine_spark.operators.full_load import FullLoad
from m3d_engine_spark.sources import catalog as cat

tmp = {tmp!r}
ref = {ref!r}

spark = build_session(
    app_name="integration-golden", master="local[2]", hive=True,
    extra_conf={{
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": "2",
        "spark.sql.warehouse.dir": tmp + "/warehouse",
    }},
)

def schema_of(path):
    with open(path) as fh:
        return StructType.fromJson(json.load(fh))

def read_psv(path, schema):
    return spark.read.schema(schema).option("delimiter", "|").csv(path)

def multiset_equal(a, b):
    ga = a.groupBy(*a.columns).count()
    gb = b.groupBy(*b.columns).count()
    return ga.exceptAll(gb).isEmpty() and gb.exceptAll(ga).isEmpty()

def fresh_databases():
    # BaseIntegrationTest.beforeEach:25-34
    spark.sql("DROP DATABASE IF EXISTS test_lake CASCADE")
    spark.sql("DROP DATABASE IF EXISTS test_landing CASCADE")
    spark.sql("CREATE DATABASE test_landing")
    spark.sql("CREATE DATABASE test_lake")

def create_target_table(location, full_schema, partitions):
    # BaseIntegrationTest.createTargetTable:42-51 — external parquet
    # table, partition columns carry their schema types.
    data_cols = ", ".join(
        "`%s` %s" % (f.name, f.dataType.simpleString())
        for f in full_schema.fields if f.name not in partitions
    )
    part_cols = ", ".join(
        "`%s` %s" % (f.name, f.dataType.simpleString())
        for f in full_schema.fields if f.name in partitions
    )
    spark.sql(
        "CREATE TABLE test_lake.test_table (" + data_cols + ") "
        "USING PARQUET PARTITIONED BY (" + part_cols + ") "
        "LOCATION '" + location + "'"
    )

def show_partitions():
    return {{r[0] for r in spark.sql(
        "SHOW PARTITIONS test_lake.test_table").collect()}}

def expected_partitions(path):
    with open(path) as fh:
        return {{line.strip() for line in fh if line.strip()}}

def partition_stats_rows(spec):
    rows = (
        spark.sql(
            "DESCRIBE EXTENDED test_lake.test_table PARTITION(" + spec + ")")
        .filter(F.col("col_name") == "Partition Statistics").collect()
    )
    return rows[0]["data_type"] if rows else ""


# ---------------------------------------------------------------- recover
def recover_scenario(res_dir, strategy):
    # RecoverPartitions{{Custom,Native}}IntegrationTest
    # 'multiple source files' scenario.
    fresh_databases()
    root = tmp + "/" + strategy
    source_dir = root + "/test_landing/test_table/data"
    header_dir = root + "/test_landing/test_table/header"
    target_dir = root + "/test_lake/test_table"
    os.makedirs(source_dir)
    os.makedirs(header_dir)
    os.makedirs(target_dir)

    full_schema = schema_of(res_dir + "/target_schema.json")
    partitions = ["year", "month", "day"]
    create_target_table(target_dir, full_schema, partitions)

    # setupInitialState:66-74 — load lake_data_pre, register partitions.
    pre = read_psv(res_dir + "/lake_data_pre.psv", full_schema)
    pre.write.mode("overwrite").partitionBy(*partitions).parquet(target_dir)
    cat.recover_partitions_native(spark, "test_lake.test_table")

    for f in ("data_20180101-part-00000.psv", "data_20180101-part-00001.psv"):
        shutil.copy(res_dir + "/" + f, source_dir + "/" + f)

    with open(res_dir + "/params.json") as fh:
        params = json.load(fh)
    params["source_dir"] = source_dir
    params["header_dir"] = header_dir
    assert params["metadata_update_strategy"] == strategy

    # pre-conditions (RecoverPartitions*IntegrationTest:40-45)
    assert spark.read.csv(source_dir).count() == 7
    assert spark.table("test_lake.test_table").count() == 19
    assert not os.path.isdir(target_dir + "/year=2018/month=1/day=1")
    assert not os.path.exists(header_dir + "/year=2018/month=1/day=1/header.json")

    AppendLoad(spark, ParamsFile(params)).run()

    # table content == lake_data_post (:50-68)
    actual = spark.table("test_lake.test_table")
    expected = read_psv(res_dir + "/lake_data_post.psv", full_schema)
    assert multiset_equal(actual, expected), strategy + ": data diff"
    # metastore partition state == expected_partitions.txt (:58-66)
    got = show_partitions()
    want = expected_partitions(res_dir + "/expected_partitions.txt")
    assert got == want, strategy + ": partitions %r != %r" % (got, want)
    # per-partition ANALYZE stats (:70-75)
    stats = partition_stats_rows("year=2018,month=1,day=1")
    assert "6 rows" in stats, strategy + ": stats %r" % stats
    # filesystem state (:77-78)
    assert os.path.isdir(target_dir + "/year=2018/month=1/day=1")
    assert os.path.exists(header_dir + "/year=2018/month=1/day=1/header.json")
    print(strategy + "_PASS")


recover_scenario(
    ref + "/RecoverPartitionsCustomIntegrationTestRes/multiple_source_files",
    "SparkRecoverPartitionsCustom",
)
recover_scenario(
    ref + "/RecoverPartitionsNativeIntegrationTestRes/multiple_source_files",
    "SparkRecoverPartitionsNative",
)


# ---------------------------------------------------------------- failfast
# FailFastIntegrationTest:26-68 — two FullLoad steps against one table.
fresh_databases()
res_dir = ref + "/FailFastIntegrationTestRes"
root = tmp + "/failfast"
source_dir = root + "/test_landing/test/test_table/data"
target_dir = root + "/test_lake/test/test_table/data"
os.makedirs(source_dir)
os.makedirs(target_dir)

full_schema = schema_of(res_dir + "/partitioned/target_schema.json")
partitions = ["year", "month", "day"]
create_target_table(target_dir, full_schema, partitions)

with open(res_dir + "/partitioned/params.json") as fh:
    params = {{
        k: v.replace("/tmp/tests", root) if isinstance(v, str) else v
        for k, v in json.load(fh).items()
    }}

expected = read_psv(res_dir + "/partitioned/lake_data_post.psv", full_schema)
want_partitions = expected_partitions(res_dir + "/partitioned/expected_partitions.txt")

def integration_step(source_file, should_fail):
    # integrationTestStep:72-116
    shutil.copy(res_dir + "/landing/" + source_file,
                source_dir + "/" + os.path.basename(source_file))
    failed = False
    try:
        FullLoad(spark, ParamsFile(params)).run()
    except Exception:
        failed = True
    assert failed == should_fail, "step %s: failed=%s" % (source_file, failed)
    actual = spark.table("test_lake.test_table")
    assert multiset_equal(actual, expected), source_file + ": data diff"
    # expected partitions ⊆ produced (:103-114)
    assert want_partitions <= show_partitions(), source_file
    # the table's current location holds the 2018/1/10 partition (:98-100)
    loc = cat.table_location(spark, "test_lake.test_table")
    loc_path = loc.removeprefix("file:")
    assert os.path.isdir(loc_path + "/year=2018/month=1/day=10"), loc

integration_step("new_data.psv", should_fail=False)
integration_step("new_data_wrong_format.psv", should_fail=True)
print("FAILFAST_PASS")

spark.stop()
"""


def test_integration_suites_golden(tmp_path):
    script = SCRIPT.format(repo="/root/repo", tmp=str(tmp_path), ref=REF)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=560,
    )
    for marker in (
        "SparkRecoverPartitionsCustom_PASS",
        "SparkRecoverPartitionsNative_PASS",
        "FAILFAST_PASS",
    ):
        assert marker in proc.stdout, (
            f"missing {marker}\nstdout tail: {proc.stdout[-1500:]}\n"
            f"stderr tail: {proc.stderr[-2500:]}"
        )
