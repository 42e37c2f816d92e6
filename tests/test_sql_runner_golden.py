"""SQLRunner golden-parity test against the reference's own fixture.

Replays SQLRunnerTest.scala "Data can be loaded from source to target
with full mode": the reference's params.json swap sequence (DROP swap →
CREATE LIKE at new timestamped location → dynamic-partition INSERT →
DROP old → RENAME swap) executed verbatim against a real Hive (Derby)
metastore, with the fixture's hard-coded /tmp/tests root substituted
for the test dir.

Runs in a subprocess like tests/test_hive_catalog.py: Hive support must
be enabled at session build and the suite's shared session is
in-memory-catalog.
"""

from __future__ import annotations

import subprocess
import sys

REF = "/root/reference/src/test/resources/com/adidas/analytics/feature/SQLRunnerTestRes"

SCRIPT = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.chdir({tmp!r})  # fresh Derby metastore_db per run
from m3d_engine_spark.session import build_session
from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.sql_runner import SQLRunner
from m3d_engine_spark.sources import catalog as cat

tmp = {tmp!r}
ref = {ref!r}

spark = build_session(
    app_name="sql-runner-golden", master="local[2]", hive=True,
    extra_conf={{
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": "2",
        "spark.sql.warehouse.dir": tmp + "/warehouse",
        "hive.exec.dynamic.partition": "true",
        "hive.exec.dynamic.partition.mode": "nonstrict",
    }},
)
spark.sql("CREATE DATABASE test_landing")
spark.sql("CREATE DATABASE test_lake")

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
# pointed at the test dir (the harness's hdfsRootTestPath).
with open(ref + "/params.json") as fh:
    params = json.load(fh)
params = {{k: v.replace("/tmp/tests", tmp) if isinstance(v, str) else v
          for k, v in params.items()}}

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
spark.stop()
"""


def test_sql_runner_swap_sequence_golden(tmp_path):
    script = SCRIPT.format(repo="/root/repo", tmp=str(tmp_path), ref=REF)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=280,
    )
    assert "SQL_RUNNER_GOLDEN_PASS" in proc.stdout, (
        f"stdout tail: {proc.stdout[-1500:]}\nstderr tail: {proc.stderr[-2500:]}"
    )
