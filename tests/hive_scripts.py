"""Bodies of the Hive-metastore (Derby) test scenarios.

All scenarios needing a REAL Hive metastore run in ONE subprocess with
ONE session (JVM + Derby bring-up is ~25s; three separate subprocesses
paid it three times). The suite's shared session stays
in-memory-catalog — a second session in the same JVM would inherit the
wrong catalog implementation, hence the subprocess.

Each body executes in its own namespace with ``spark``, ``tmp`` (a
scenario-private scratch dir) and ``ref`` (its reference fixture root)
provided, and prints a marker the owning test asserts on. A body
failure propagates, failing every not-yet-printed marker — acceptable:
these are sequential lifecycle scenarios, not isolated units.
"""

from __future__ import annotations

import subprocess
import sys

PRELUDE = r"""
import json, os, shutil, sys
sys.path.insert(0, "/root/repo")
os.chdir(TMP_ROOT)  # fresh Derby metastore_db per run
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from m3d_engine_spark.session import build_session
from m3d_engine_spark.sources import catalog as cat

spark = build_session(
    app_name="hive-golden", master="local[2]", hive=True,
    extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": "2",
        "spark.sql.warehouse.dir": TMP_ROOT + "/warehouse",
        "hive.exec.dynamic.partition": "true",
        "hive.exec.dynamic.partition.mode": "nonstrict",
    },
)
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
"""

# ----------------------------------------------------------- hive smoke
# tests/test_hive_catalog.py — catalog DDL wrappers against Derby.
HIVE_SMOKE = r"""
spark.sql("CREATE DATABASE IF NOT EXISTS lakedb")
df = spark.createDataFrame([(1, "a", 2020), (2, "b", 2021)], "k int, v string, year int")
loc = tmp + "/data/t1"
df.write.partitionBy("year").parquet(loc)
spark.sql(
    "CREATE EXTERNAL TABLE lakedb.t1 (k int, v string) "
    "PARTITIONED BY (year int) STORED AS PARQUET LOCATION '" + loc + "'"
)
cat.recover_partitions_native(spark, "lakedb.t1")
assert spark.table("lakedb.t1").count() == 2
assert cat.table_location(spark, "lakedb.t1").endswith("/data/t1")
cat.compute_statistics(
    spark, "lakedb.t1", partition_specs=cat.list_table_partitions(spark, "lakedb.t1")
)
loc2 = tmp + "/data/t1_v2"
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
loc3 = tmp + "/data/t2"
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
newpart = tmp + "/data/t2_repoint"
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
"""

# ------------------------------------------------------- sql runner golden
# tests/test_sql_runner_golden.py — the reference's Hive swap sequence.
SQL_RUNNER = r"""
from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.sql_runner import SQLRunner

spark.sql("CREATE DATABASE IF NOT EXISTS test_landing")
spark.sql("CREATE DATABASE IF NOT EXISTS test_lake")

# Schema exactly as the reference: DSV reader, header + inferSchema
# (FileReader.scala:18-30).
src = spark.read.options(header=True, inferSchema=True, delimiter="|").csv(
    ref + "/sql_runner_dataset.psv"
)
partitions = ["year", "month", "day"]
def _ddl(fields):
    return ", ".join(
        "`" + f.name + "` " + f.dataType.simpleString() for f in fields
    )

data_cols = _ddl(f for f in src.schema.fields if f.name not in partitions)
part_cols = _ddl(f for f in src.schema.fields if f.name in partitions)
all_cols = _ddl(src.schema.fields)

# Source: external DSV table, not partitioned (SQLRunnerTest.scala:39-42).
src_loc = tmp + "/test_landing/bi_sales_order"
spark.sql(
    "CREATE EXTERNAL TABLE test_landing.bi_sales_order (" + all_cols + ") "
    "ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' STORED AS TEXTFILE "
    "LOCATION '" + src_loc + "'"
)
src.write.insertInto("test_landing.bi_sales_order")
assert spark.table("test_landing.bi_sales_order").count() == 19

# Target: external DSV table partitioned y/m/d at the OLD timestamped
# location (SQLRunnerTest.scala:44-48).
old_loc = tmp + "/test_lake/bi_sales_order/20180505_020927_EDT"
new_loc = tmp + "/test_lake/bi_sales_order/20190201_020927_EDT"
spark.sql(
    "CREATE EXTERNAL TABLE test_lake.bi_sales_order (" + data_cols + ") "
    "PARTITIONED BY (" + part_cols + ") "
    "ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' STORED AS TEXTFILE "
    "LOCATION '" + old_loc + "'"
)

# The reference's own params.json, with its hard-coded /tmp/tests root
# pointed at the scenario dir (the harness's hdfsRootTestPath).
with open(ref + "/params.json") as fh:
    params = json.load(fh)
params = {k: v.replace("/tmp/tests", tmp) if isinstance(v, str) else v
          for k, v in params.items()}

SQLRunner(spark, ParamsFile(params)).run()

target = spark.table("test_lake.bi_sales_order")
assert target.count() == 19, target.count()
assert not spark.catalog.tableExists("test_lake.bi_sales_order_swap")
# hasDiff == false (SQLRunnerTest.scala:60): multiset equality.
source = spark.table("test_landing.bi_sales_order")
assert source.exceptAll(target).count() == 0
assert target.exceptAll(source).count() == 0
# Table now lives at the NEW timestamped location (SQLRunnerTest.scala:62-64).
loc = cat.table_location(spark, "test_lake.bi_sales_order")
assert loc.rstrip("/").endswith("/20190201_020927_EDT"), loc

print("SQL_RUNNER_GOLDEN_PASS")
"""

# ----------------------------------------------------- integration suites
# tests/test_integration_golden.py — the reference's 3 integration tests.
INTEGRATION = r"""
from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.append_load import AppendLoad
from m3d_engine_spark.operators.full_load import FullLoad

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
    return {r[0] for r in spark.sql(
        "SHOW PARTITIONS test_lake.test_table").collect()}

def expected_partitions(path):
    with open(path) as fh:
        return {line.strip() for line in fh if line.strip()}

def partition_stats_rows(spec):
    rows = (
        spark.sql(
            "DESCRIBE EXTENDED test_lake.test_table PARTITION(" + spec + ")")
        .filter(F.col("col_name") == "Partition Statistics").collect()
    )
    return rows[0]["data_type"] if rows else ""


def recover_scenario(res_dir, strategy):
    # RecoverPartitions{Custom,Native}IntegrationTest
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
    params = {
        k: v.replace("/tmp/tests", root) if isinstance(v, str) else v
        for k, v in json.load(fh).items()
    }

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
    # expected partitions <= produced (:103-114)
    assert want_partitions <= show_partitions(), source_file
    # the table's current location holds the 2018/1/10 partition (:98-100)
    loc = cat.table_location(spark, "test_lake.test_table")
    loc_path = loc.removeprefix("file:")
    assert os.path.isdir(loc_path + "/year=2018/month=1/day=10"), loc

integration_step("new_data.psv", should_fail=False)
integration_step("new_data_wrong_format.psv", should_fail=True)
print("FAILFAST_PASS")
"""

# ------------------------------------------- full load: missing location
# FullLoadTest.scala:165-198 'Previous lake table location folder does
# not exist.' — the catalog still points at a versioned dir whose files
# are gone; the swap load must succeed, re-point the table, and keep the
# catalog schema intact (the restore machinery must tolerate a missing
# previous version).
FULL_LOAD_MISSING_LOC = r"""
from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.full_load import FullLoad

def schema_of(path):
    with open(path) as fh:
        return StructType.fromJson(json.load(fh))

def read_psv(path, schema):
    return (
        spark.read.schema(schema).option("delimiter", "|")
        .option("nullValue", "XXNULLXXX").csv(path)
    )

def multiset_equal(a, b):
    ga = a.groupBy(*a.columns).count()
    gb = b.groupBy(*b.columns).count()
    return ga.exceptAll(gb).isEmpty() and gb.exceptAll(ga).isEmpty()

spark.sql("DROP DATABASE IF EXISTS test_lake CASCADE")
spark.sql("CREATE DATABASE test_lake")

res = ref + "/non_partitioned"
target_schema = schema_of(res + "/target_schema.json")
base = tmp + "/test_lake/test_table"
loc_v1 = base + "/20180505_020927_EDT"

read_psv(res + "/lake_data_pre.psv", target_schema).write.parquet(loc_v1)
cols = ", ".join(
    "`%s` %s" % (f.name, f.dataType.simpleString()) for f in target_schema.fields
)
spark.sql(
    "CREATE EXTERNAL TABLE test_lake.test_table (" + cols + ") "
    "STORED AS PARQUET LOCATION '" + loc_v1 + "'"
)
assert spark.table("test_lake.test_table").count() == 19

# Delete the table location folder before the full load (:178-180).
shutil.rmtree(loc_v1)

FullLoad(spark, ParamsFile({
    "source_dir": ref + "/landing/new_data.psv",
    "file_format": "dsv",
    "delimiter": "|",
    "has_header": False,
    "target_table": "test_lake.test_table",
})).run()

actual = spark.table("test_lake.test_table")
expected = read_psv(res + "/lake_data_post.psv", target_schema)
assert multiset_equal(actual, expected), "data diff after missing-location load"
assert actual.schema == target_schema, actual.schema
new_loc = cat.table_location(spark, "test_lake.test_table")
assert not new_loc.endswith("20180505_020927_EDT"), new_loc
print("FULL_LOAD_MISSING_LOC_PASS")

# FullLoadTest.scala:301-363 'old leftovers are cleansed properly after
# successful load' — stray version dirs + $folder$ markers at the table
# root vanish after the swap; only the new location (and its marker
# pattern) survives.
spark.sql("DROP DATABASE IF EXISTS test_lake CASCADE")
spark.sql("CREATE DATABASE test_lake")

res_p = ref + "/partitioned"
full_schema = schema_of(res_p + "/target_schema.json")
partitions = ["year", "month", "day"]
root2 = tmp + "/leftovers/test_lake/test_table"
loc_seed = root2 + "/data_20180505_020927"

pre = read_psv(res_p + "/lake_data_pre.psv", full_schema)
pre.write.partitionBy(*partitions).parquet(loc_seed)
data_cols = ", ".join(
    "`%s` %s" % (f.name, f.dataType.simpleString())
    for f in full_schema.fields if f.name not in partitions
)
part_cols = ", ".join(
    "`%s` %s" % (f.name, f.dataType.simpleString())
    for f in full_schema.fields if f.name in partitions
)
spark.sql(
    "CREATE EXTERNAL TABLE test_lake.test_table (" + data_cols + ") "
    "PARTITIONED BY (" + part_cols + ") "
    "STORED AS PARQUET LOCATION '" + loc_seed + "'"
)
cat.recover_partitions_native(spark, "test_lake.test_table")
assert spark.table("test_lake.test_table").count() == 19

# manually create old leftovers (:318-330)
for d in ("data_20000101124514567/year=2000", "data_20000221124511234/year=2000"):
    os.makedirs(root2 + "/" + d)
    open(root2 + "/" + d + "/sample_file1.parquet", "w").close()
    open(root2 + "/" + d + "/sample_file2.parquet", "w").close()
open(root2 + "/data_20000101124514567_$folder$", "w").close()
open(root2 + "/data_20000221124511234_$folder$", "w").close()
assert len(os.listdir(root2)) == 5

landing_schema = StructType(
    [f for f in full_schema.fields if f.name not in partitions]
)
FullLoad(spark, ParamsFile({
    "source_dir": ref + "/landing/new_data.psv",
    "file_format": "dsv",
    "delimiter": "|",
    "has_header": False,
    "target_table": "test_lake.test_table",
    "schema": landing_schema.jsonValue(),
    "target_partitions": partitions,
    "partition_column": "date",
    "partition_column_format": "yyyyMMdd",
})).run()

actual = spark.table("test_lake.test_table").select(
    *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
)
expected = read_psv(res_p + "/lake_data_post.psv", full_schema)
assert multiset_equal(actual, expected), "data diff after leftover-cleanup load"
final_loc = cat.table_location(spark, "test_lake.test_table")
final_name = final_loc.rstrip("/").rsplit("/", 1)[1]
left = os.listdir(root2)
assert all(final_name in e for e in left), left  # only the new version remains
assert os.path.isdir(final_loc.removeprefix("file:") + "/year=2018/month=1/day=10")
print("FULL_LOAD_LEFTOVERS_PASS")

# Session-review regression: an onboarded FLAT-layout table (catalog
# location /db/orders with sibling datasets /db/customers) must NOT
# trigger leftover cleanup — deleting siblings there would destroy
# unrelated tables. Cleanup only runs for versioned layouts.
spark.sql("DROP DATABASE IF EXISTS test_lake CASCADE")
spark.sql("CREATE DATABASE test_lake")

flat_root = tmp + "/flat_db"
orders_loc = flat_root + "/orders"
sibling_loc = flat_root + "/customers"
read_psv(res + "/lake_data_pre.psv", target_schema).write.parquet(orders_loc)
spark.range(5).write.parquet(sibling_loc)
cols = ", ".join(
    "`%s` %s" % (f.name, f.dataType.simpleString()) for f in target_schema.fields
)
spark.sql(
    "CREATE EXTERNAL TABLE test_lake.orders_flat (" + cols + ") "
    "STORED AS PARQUET LOCATION '" + orders_loc + "'"
)
FullLoad(spark, ParamsFile({
    "source_dir": ref + "/landing/new_data.psv",
    "file_format": "dsv",
    "delimiter": "|",
    "has_header": False,
    "target_table": "test_lake.orders_flat",
})).run()
expected_flat = read_psv(res + "/lake_data_post.psv", target_schema)
assert multiset_equal(spark.table("test_lake.orders_flat"), expected_flat)
assert os.path.isdir(sibling_loc), "sibling dataset was deleted!"
assert spark.read.parquet(sibling_loc).count() == 5
print("FULL_LOAD_FLAT_LAYOUT_SAFE_PASS")
"""

FULL_LOAD_REF = (
    "/root/reference/src/test/resources/com/adidas/analytics/feature/loads/FullLoadTestRes"
)
SQL_RUNNER_REF = (
    "/root/reference/src/test/resources/com/adidas/analytics/feature/SQLRunnerTestRes"
)
INTEGRATION_REF = (
    "/root/reference/src/test/resources/com/adidas/analytics/integration"
)


def run_all(tmp_root: str) -> subprocess.CompletedProcess:
    """Compose and run every Hive scenario in one subprocess. Each body
    executes in its own namespace (no cross-scenario name collisions)
    with a private scratch dir."""
    bodies = [
        ("hive_smoke", HIVE_SMOKE, ""),
        ("sql_runner", SQL_RUNNER, SQL_RUNNER_REF),
        ("integration", INTEGRATION, INTEGRATION_REF),
        ("full_load_missing_loc", FULL_LOAD_MISSING_LOC, FULL_LOAD_REF),
    ]
    runner = [
        f"TMP_ROOT = {tmp_root!r}",
        PRELUDE,
        "base_ns = {'spark': spark, 'F': F, 'StructType': StructType,",
        "           'cat': cat, 'json': json, 'os': os, 'shutil': shutil}",
    ]
    for name, body, ref in bodies:
        runner.append(
            f"ns = dict(base_ns, tmp=TMP_ROOT + '/{name}', ref={ref!r})\n"
            f"exec(compile({body!r}, {name!r}, 'exec'), ns)"
        )
    runner.append("spark.stop()")
    return subprocess.run(
        [sys.executable, "-c", "\n".join(runner)],
        capture_output=True, text=True, timeout=560,
    )
