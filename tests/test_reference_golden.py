"""Golden-file parity against the REFERENCE's own test fixtures.

Reads the fixture data directly from the read-only reference checkout
(never copied into this repo) and replays the FullLoadTest scenarios:
run OUR FullLoad on the reference's landing PSV, multiset-compare the
result with the reference's expected ``lake_data_post.psv`` — the same
order-insensitive groupBy-all-count diff the reference's harness uses
(TestUtils.scala:10-24).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.full_load import FullLoad

REF = "/root/reference/src/test/resources/com/adidas/analytics/feature/loads/FullLoadTestRes"

# Slow lane since round 8 (VERDICT r7 item 5 — default-lane budget):
# golden replication runs once per session via `-m slow`; per-commit
# parity for SQL-expressible ops stays on the oracle gate.
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference fixtures not present"
    ),
]


def _schema(path: str) -> StructType:
    with open(path) as fh:
        return StructType.fromJson(json.load(fh))


def _read_psv(spark, path: str, schema: StructType):
    return (
        spark.read.schema(schema)
        .option("delimiter", "|")
        .option("nullValue", "XXNULLXXX")
        .csv(path)
    )


def _multiset_equal(a, b) -> bool:
    ga = a.groupBy(*a.columns).count()
    gb = b.groupBy(*b.columns).count()
    return ga.exceptAll(gb).isEmpty() and gb.exceptAll(ga).isEmpty()


def test_full_load_non_partitioned_golden(spark, tmp_path):
    schema = _schema(f"{REF}/non_partitioned/target_schema.json")
    params = ParamsFile(
        {
            "source_dir": f"{REF}/landing/new_data.psv",
            "file_format": "dsv",
            "delimiter": "|",
            "has_header": False,
            "target_location": str(tmp_path / "out"),
            "schema": schema.jsonValue(),
        }
    )
    FullLoad(spark, params).run()
    got = spark.read.parquet(str(tmp_path / "out"))
    expected = _read_psv(spark, f"{REF}/non_partitioned/lake_data_post.psv", schema)
    assert _multiset_equal(got, expected)


def test_full_load_partitioned_golden(spark, tmp_path):
    full_schema = _schema(f"{REF}/partitioned/target_schema.json")
    targets = ["year", "month", "day"]
    landing_schema = StructType([f for f in full_schema.fields if f.name not in targets])
    params = ParamsFile(
        {
            "source_dir": f"{REF}/landing/new_data.psv",
            "file_format": "dsv",
            "delimiter": "|",
            "has_header": False,
            "target_location": str(tmp_path / "out"),
            "schema": landing_schema.jsonValue(),
            "target_partitions": targets,
            "partition_column": "date",
            "partition_column_format": "yyyyMMdd",
        }
    )
    FullLoad(spark, params).run()
    got = spark.read.parquet(str(tmp_path / "out")).select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in full_schema.fields
        ]
    )
    expected = _read_psv(spark, f"{REF}/partitioned/lake_data_post.psv", full_schema)
    assert _multiset_equal(got, expected)


def test_full_load_partitioned_weekly_golden(spark, tmp_path):
    """Weekly partitions exercise the ALIGNED-week semantics against the
    reference's expected values."""
    full_schema = _schema(f"{REF}/partitioned_weekly/target_schema.json")
    targets = ["year", "week"]
    landing_schema = StructType([f for f in full_schema.fields if f.name not in targets])
    params = ParamsFile(
        {
            "source_dir": f"{REF}/landing/new_data_weekly.psv",
            "file_format": "dsv",
            "delimiter": "|",
            "has_header": False,
            "target_location": str(tmp_path / "out"),
            "schema": landing_schema.jsonValue(),
            "target_partitions": targets,
            "partition_column": "date",
            "partition_column_format": "yyyyww",
        }
    )
    FullLoad(spark, params).run()
    got = spark.read.parquet(str(tmp_path / "out")).select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in full_schema.fields
        ]
    )
    expected = _read_psv(spark, f"{REF}/partitioned_weekly/lake_data_post.psv", full_schema)
    assert _multiset_equal(got, expected)


FEAT = "/root/reference/src/test/resources/com/adidas/analytics/feature"


def test_transpose_golden(spark, tmp_path):
    """TransposeTest scenario: long→wide pivot with the target schema's
    pivot values + schema enforcement."""
    from m3d_engine_spark.operators.transpose import transpose
    from m3d_engine_spark.plans.partitions import enforce_schema

    t = f"{FEAT}/TransposeTestRes"
    src_schema = _schema(f"{t}/source_schema.json")
    tgt_schema = _schema(f"{t}/target_schema.json")
    src = _read_psv(spark, f"{t}/input_data.psv", src_schema)
    pivot_values = [f.name for f in tgt_schema.fields if f.name != "id"]
    out = enforce_schema(
        transpose(src, ["id"], "name", "value", pivot_values=pivot_values),
        tgt_schema,
    )
    expected = _read_psv(spark, f"{t}/expected_target_data.psv", tgt_schema)
    assert _multiset_equal(out, expected)


def test_fixed_size_extractor_golden(spark, tmp_path):
    """FixedSizeStringExtractorTest matched_schema scenario: fixed-width
    NOAA station lines → typed columns, blank fields → NULL."""
    from m3d_engine_spark.operators.fixed_size_extractor import (
        FixedField,
        extract_fixed_width,
    )

    t = f"{FEAT}/FixedSizeStringExtractorTestRes/matched_schema"
    src_schema = _schema(f"{t}/source_schema.json")
    tgt_schema = _schema(f"{t}/target_schema.json")
    # source is whole lines: read as single-column csv with a delimiter
    # that never occurs so the line stays intact
    src = (
        spark.read.schema(src_schema)
        .option("delimiter", "\t")
        .csv(f"{t}/source_data.psv")
    )
    positions = ["1,11", "13,20", "22,30", "32,37", "39,40", "42,71", "73,75", "77,79", "81,85"]
    fields = []
    for f, pos in zip(tgt_schema.fields, positions):
        start, end = (int(x) for x in pos.split(","))
        fields.append(FixedField(f.name, start, end, f.dataType.simpleString()))
    out = extract_fixed_width(src, "value", fields)
    expected = _read_psv(spark, f"{t}/lake_data_post.psv", tgt_schema)
    assert _multiset_equal(out, expected)


def _read_psv_header(spark, path: str, schema: StructType):
    """Fixture PSVs that carry a header row: read by name, cast to the
    fixture schema (the files may hold extra columns the schema omits)."""
    raw = (
        spark.read.option("delimiter", "|")
        .option("header", True)
        .option("nullValue", "XXNULLXXX")
        .csv(path)
    )
    return raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def test_delta_load_partitioned_merge_golden(spark, tmp_path):
    """DeltaLoadTest parquet partitioned-merge scenario end-to-end:
    pre-loaded active table + CDC delta file → condensed merge written
    back over the affected partitions; full table must equal the
    reference's active_data_post (updates applied, deletes dropped,
    new partition added, untouched partitions intact)."""
    from m3d_engine_spark.operators.delta_load import DeltaLoadAlgorithm

    d = f"{FEAT}/loads/DeltaLoadTestRes/parquet_test_delta_merge_partitioned"
    active_schema = _schema(f"{d}/active_data_schema.json")
    delta_schema = _schema(f"{d}/delta_data_schema.json")

    loc = str(tmp_path / "active")
    _read_psv_header(spark, f"{d}/active_data_pre.psv", active_schema).write.partitionBy(
        "year", "month", "day"
    ).parquet(loc)
    spark.read.parquet(loc).createOrReplaceTempView("golden_delta_active")

    delta_loc = str(tmp_path / "delta")
    _read_psv_header(spark, f"{d}/delta_data.psv", delta_schema).write.parquet(delta_loc)

    params = ParamsFile(
        {
            "active_records_table_lake": "golden_delta_active",
            "delta_records_file_path": delta_loc,
            "business_key": ["salesorder", "item"],
            "technical_key": ["actrequest_timestamp", "datapakid", "partno", "record"],
            "record_mode_column": "recordmode",
            "target_partitions": ["year", "month", "day"],
            "partition_column": "date",
            "partition_column_format": "yyyyMMdd",
            "target_location": loc,
        }
    )
    DeltaLoadAlgorithm(spark, params).run()

    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in active_schema.fields]
    )
    expected = _read_psv_header(spark, f"{d}/active_data_post.psv", active_schema)
    assert _multiset_equal(got, expected)


def test_nested_flattener_golden(spark, tmp_path):
    """NestedFlattenerTest scenario 1: deep mParticle-style event
    parquet (structs 4 deep, list<struct>) flattened with the exact
    fields_to_flatten / column_mapping from the reference's params."""
    from m3d_engine_spark.operators.nested_flattener import flat_dataframe

    n = f"{FEAT}/NestedFlattenerTestRes"
    with open(f"{n}/scenario1/params.json") as fh:
        p = json.load(fh)
    src = spark.read.parquet(f"{n}/nest_test/data")
    out = flat_dataframe(
        src,
        p["fields_to_flatten"],
        p["column_mapping"],
        chars_to_replace=p["chars_to_replace"],
        replacement=p["replacement_char"],
    )
    tgt_schema = _schema(f"{n}/target_schema.json")
    got = out.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in tgt_schema.fields]
    )
    expected = _read_psv(spark, f"{n}/expected_target_data.psv", tgt_schema)
    assert _multiset_equal(got, expected)


def test_append_load_main_golden(spark, tmp_path):
    """AppendLoadTest main_test: partition values regex-extracted from
    the landing FILENAME (lookahead/lookbehind regexes), appended onto a
    pre-loaded partitioned lake; full table must equal the expected
    post-state."""
    import shutil

    from m3d_engine_spark.operators.append_load import AppendLoad

    a = f"{FEAT}/loads/AppendLoadTestRes/main_test"
    with open(f"{a}/params.json") as fh:
        ref_params = json.load(fh)
    full_schema = _schema(f"{a}/target_schema.json")
    targets = ref_params["target_partitions"]

    loc = str(tmp_path / "lake")
    _read_psv(spark, f"{a}/lake_data_pre.psv", full_schema).write.partitionBy(
        *targets
    ).parquet(loc)

    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(f"{a}/data_20180422-00001.psv", landing / "data_20180422-00001.psv")

    params = ParamsFile(
        {
            "source_dir": str(landing),
            "header_dir": str(tmp_path / "headers"),
            "file_format": "dsv",
            "delimiter": ref_params["delimiter"],
            "has_header": ref_params["has_header"],
            "regex_filename": ref_params["regex_filename"],
            "target_partitions": targets,
            "target_location": loc,
            "schema": full_schema.jsonValue(),
        }
    )
    AppendLoad(spark, params).run()

    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv(spark, f"{a}/lake_data_post.psv", full_schema)
    assert _multiset_equal(got, expected)


def test_range_materialization_golden(spark, tmp_path):
    """MaterializationTest range y/m/d multi-day scenario: materialize
    only the partitions inside [date_from, date_to]."""
    from m3d_engine_spark.operators.materialization import RangeMaterialization

    m = f"{FEAT}/MaterializationTestRes/range_materialization/year_month_day_multiple_days"
    with open(f"{m}/params.json") as fh:
        ref_params = json.load(fh)
    schema = _schema(f"{m}/schema.json")
    _read_psv(spark, f"{m}/source_data.psv", schema).createOrReplaceTempView(
        "golden_mat_source"
    )
    target = str(tmp_path / "mart")
    params = ParamsFile(
        {
            "source_table": "golden_mat_source",
            "target_dir": target,
            "target_partitions": ref_params["target_partitions"],
            "date_from": ref_params["date_from"],
            "date_to": ref_params["date_to"],
        }
    )
    algo = RangeMaterialization(spark, params)
    algo.run()
    got = spark.read.parquet(target).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    expected = _read_psv(spark, f"{m}/expected_data.psv", schema)
    assert _multiset_equal(got, expected)


def test_semistructured_json_load_golden(spark, tmp_path):
    """SemiStructuredLoadTest json scenario: partitions regex-extracted
    from the hierarchical landing PATH (year=/month=/day=), JSON read
    with the inline schema, appended over the pre-loaded lake."""
    import shutil

    from m3d_engine_spark.operators.append_load import AppendLoad

    s = f"{FEAT}/loads/SemiStructuredLoadTestRes/semistructured_json_load"
    with open(f"{s}/params.json") as fh:
        ref_params = json.load(fh)
    full_schema = StructType.fromJson(ref_params["schema"])
    targets = ref_params["target_partitions"]

    loc = str(tmp_path / "lake")
    pre = spark.read.schema(full_schema).json(f"{s}/lake_data_pre.txt")
    pre.write.partitionBy(*targets).parquet(loc)

    landing = tmp_path / "landing" / "year=2018" / "month=01" / "day=02"
    landing.mkdir(parents=True)
    shutil.copy(f"{s}/data-nodate-part-00001.txt", landing / "part-00001.txt")

    params = ParamsFile(
        {
            "source_dir": str(tmp_path / "landing"),
            "header_dir": str(tmp_path / "headers"),
            "file_format": "json",
            "regex_filename": ref_params["regex_filename"],
            "target_partitions": targets,
            "target_location": loc,
            "schema": ref_params["schema"],
        }
    )
    AppendLoad(spark, params).run()

    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = spark.read.schema(full_schema).json(f"{s}/lake_data_post.txt")
    assert _multiset_equal(got, expected)


@pytest.mark.slow
def test_delta_lake_load_added_columns_golden(spark, tmp_path):
    """DeltaLakeLoadTest added_columns_and_duplicates_in_init: init load
    with duplicate business keys (condensation with recordmode
    tie-break), then a CDC merge whose delta adds a 'discount' column —
    the lake must match control_data (schema evolved, deletes dropped,
    duplicates condensed). Runs on the parquet fallback (no delta-spark
    in this container)."""
    import shutil

    from m3d_engine_spark.operators.delta_lake_load import DeltaLakeLoadAlgorithm

    d = f"{FEAT}/loads/DeltaLakeLoadTestRes"
    a = f"{d}/added_columns_and_duplicates_in_init"
    with open(f"{d}/params.json") as fh:
        ref_params = json.load(fh)
    final_schema = _schema(f"{a}/lake_schema_final.json")

    lake = str(tmp_path / "lake")
    delta_dir = str(tmp_path / "delta_table")

    def run(batch_file: str) -> None:
        land = tmp_path / "landing"
        shutil.rmtree(land, ignore_errors=True)
        land.mkdir()
        shutil.copy(batch_file, land / "batch.psv")
        params = ParamsFile(
            {
                "source_dir": str(land),
                "file_format": ref_params["file_format"],
                "delimiter": ref_params["delimiter"],
                "has_header": ref_params["has_header"],
                "delta_table_dir": delta_dir,
                "target_location": lake,
                "business_key": ref_params["business_key"],
                "condensation_key": ref_params["condensation_key"],
                "record_mode_column": ref_params["record_mode_column"],
                "target_partitions": ref_params["target_partitions"],
                "partition_column": ref_params["partition_column"],
                "partition_column_format": ref_params["partition_column_format"],
            }
        )
        DeltaLakeLoadAlgorithm(spark, params).run()

    run(f"{a}/init_data.psv")
    run(f"{a}/new_data.psv")

    got_raw = spark.read.option("mergeSchema", "true").parquet(lake)
    got = got_raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in final_schema.fields]
    )
    expected_raw = (
        spark.read.option("delimiter", "|")
        .option("header", True)
        .option("nullValue", "XXNULLXXX")
        .csv(f"{a}/control_data.psv")
    )
    expected = expected_raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in final_schema.fields]
    )
    assert _multiset_equal(got, expected)


def test_append_load_different_schemas_golden(spark, tmp_path):
    """AppendLoadTest different_schemas: two landing files with
    DIFFERENT column sets in one load — the day=01 group reads with its
    persisted header.json (no 'article'), the day=05 group falls back
    to the target schema; article is NULL for the header group and
    populated for the other (AppendLoad.scala:87-179)."""
    import shutil

    from m3d_engine_spark.operators.append_load import AppendLoad

    a = f"{FEAT}/loads/AppendLoadTestRes/different_schemas"
    with open(f"{a}/params.json") as fh:
        ref_params = json.load(fh)
    full_schema = _schema(f"{a}/target_schema.json")
    targets = ref_params["target_partitions"]

    loc = str(tmp_path / "lake")
    _read_psv(spark, f"{a}/lake_data_pre.psv", full_schema).write.partitionBy(
        *targets
    ).parquet(loc)

    landing = tmp_path / "landing"
    landing.mkdir()
    for f in ("data_20180101-part-00000.psv", "data_20180105-part-00000.psv"):
        shutil.copy(f"{a}/{f}", landing / f)
    # pre-place the persisted header for the 2018-01-01 partition
    headers = tmp_path / "headers" / "year=2018" / "month=1" / "day=1"
    headers.mkdir(parents=True)
    shutil.copy(f"{a}/20180101_schema.json", headers / "header.json")

    params = ParamsFile(
        {
            "source_dir": str(landing),
            "header_dir": str(tmp_path / "headers"),
            "file_format": "dsv",
            "delimiter": ref_params["delimiter"],
            "has_header": ref_params["has_header"],
            "regex_filename": ref_params["regex_filename"],
            "target_partitions": targets,
            "target_location": loc,
            "schema": full_schema.jsonValue(),
        }
    )
    AppendLoad(spark, params).run()

    got = spark.read.option("mergeSchema", "true").parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv(spark, f"{a}/lake_data_post.psv", full_schema)
    assert _multiset_equal(got, expected)


def test_append_load_duplicate_values_golden(spark, tmp_path):
    """AppendLoadTest duplicate_values: exact duplicate source rows are
    APPENDED verbatim (AppendLoad never dedups), one group reads via a
    pre-seeded header.json missing 'article', the other creates its
    header — post-state and both header files must match the
    reference's expectations."""
    import shutil

    from m3d_engine_spark.operators.append_load import AppendLoad

    a = f"{FEAT}/loads/AppendLoadTestRes/duplicate_values"
    with open(f"{a}/params.json") as fh:
        ref_params = json.load(fh)
    full_schema = _schema(f"{a}/target_schema.json")
    targets = ref_params["target_partitions"]

    loc = str(tmp_path / "lake")
    _read_psv(spark, f"{a}/lake_data_pre.psv", full_schema).write.partitionBy(
        *targets
    ).parquet(loc)

    landing = tmp_path / "landing"
    landing.mkdir()
    for f in ("data_20180101-part-00000.psv", "data_20180105-part-00000.psv"):
        shutil.copy(f"{a}/{f}", landing / f)
    headers = tmp_path / "headers" / "year=2018" / "month=1" / "day=1"
    headers.mkdir(parents=True)
    shutil.copy(f"{a}/20180101_schema.json", headers / "header.json")

    params = ParamsFile(
        {
            "source_dir": str(landing),
            "header_dir": str(tmp_path / "headers"),
            "file_format": "dsv",
            "delimiter": ref_params["delimiter"],
            "has_header": ref_params["has_header"],
            "regex_filename": ref_params["regex_filename"],
            "target_partitions": targets,
            "target_location": loc,
            "schema": full_schema.jsonValue(),
        }
    )
    AppendLoad(spark, params).run()

    got = spark.read.option("mergeSchema", "true").parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv(spark, f"{a}/lake_data_post.psv", full_schema)
    assert _multiset_equal(got, expected)
    # header created for the new partition, reused one still in place
    assert (tmp_path / "headers" / "year=2018" / "month=1" / "day=1" / "header.json").exists()
    assert (tmp_path / "headers" / "year=2018" / "month=1" / "day=5" / "header.json").exists()


def test_append_load_parquet_golden(spark, tmp_path):
    """AppendLoadTest parquet_test: parquet landing files without
    partition columns — partitions regex-extracted from the file PATH
    (lookbehind on '/'), appended onto a psv-seeded lake."""
    import shutil

    from m3d_engine_spark.operators.append_load import AppendLoad

    a = f"{FEAT}/loads/AppendLoadTestRes/parquet_test"
    with open(f"{a}/params.json") as fh:
        ref_params = json.load(fh)
    full_schema = _schema(f"{a}/target_schema.json")
    targets = ref_params["target_partitions"]

    loc = str(tmp_path / "lake")
    _read_psv(spark, f"{a}/lake_data_pre.psv", full_schema).write.partitionBy(
        *targets
    ).parquet(loc)

    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(
        f"{a}/data_20180422-00001.parquet", landing / "data_20180422-00001.parquet"
    )

    params = ParamsFile(
        {
            "source_dir": str(landing),
            "header_dir": str(tmp_path / "headers"),
            "file_format": "parquet",
            "regex_filename": ref_params["regex_filename"],
            "target_partitions": targets,
            "target_location": loc,
            "schema": full_schema.jsonValue(),
        }
    )
    AppendLoad(spark, params).run()

    got = spark.read.option("mergeSchema", "true").parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv(spark, f"{a}/lake_data_post.psv", full_schema)
    assert _multiset_equal(got, expected)
    assert (
        tmp_path / "headers" / "year=2018" / "month=4" / "day=22" / "header.json"
    ).exists()


def test_append_load_failfast_malformed_raises(spark, tmp_path):
    """AppendLoadTest reader_mode FAILFAST: malformed landing rows must
    abort the load with an exception, leaving the lake untouched."""
    import shutil

    from m3d_engine_spark.operators.append_load import AppendLoad

    a = f"{FEAT}/loads/AppendLoadTestRes/reader_mode_specification"
    with open(f"{a}/params_failfast_mode.json") as fh:
        ref_params = json.load(fh)
    full_schema = _schema(f"{a}/target_schema.json")
    targets = ref_params["target_partitions"]

    loc = str(tmp_path / "lake")
    _read_psv(spark, f"{a}/lake_data_pre.psv", full_schema).write.partitionBy(
        *targets
    ).parquet(loc)
    pre_count = spark.read.parquet(loc).count()

    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(
        f"{a}/wrong_data_20180422-00001.psv", landing / "wrong_data_20180422-00001.psv"
    )

    params = ParamsFile(
        {
            "source_dir": str(landing),
            "header_dir": str(tmp_path / "headers"),
            "file_format": "dsv",
            "delimiter": ref_params["delimiter"],
            "has_header": ref_params["has_header"],
            "regex_filename": ref_params["regex_filename"],
            "reader_mode": ref_params["reader_mode"],
            "target_partitions": targets,
            "target_location": loc,
            "schema": full_schema.jsonValue(),
        }
    )
    with pytest.raises(Exception):
        AppendLoad(spark, params).run()
    assert spark.read.parquet(loc).count() == pre_count


def test_range_materialization_preserves_other_partitions_golden(spark, tmp_path):
    """MaterializationTest 'other partitions exist in the target table':
    a single-day materialization must overwrite ONLY its partition;
    pre-existing partitions for other days survive untouched, and the
    result equals expected ∪ initial."""
    from m3d_engine_spark.operators.materialization import RangeMaterialization

    m = f"{FEAT}/MaterializationTestRes/range_materialization/year_month_day_single_day"
    with open(f"{m}/params.json") as fh:
        ref_params = json.load(fh)
    schema = _schema(f"{m}/schema.json")
    targets = ref_params["target_partitions"]
    _read_psv(spark, f"{m}/source_data.psv", schema).createOrReplaceTempView(
        "golden_mat_single_source"
    )
    target = str(tmp_path / "mart")
    initial = _read_psv(spark, f"{m}/initial_data.psv", schema)
    initial.write.partitionBy(*targets).parquet(target)

    params = ParamsFile(
        {
            "source_table": "golden_mat_single_source",
            "target_dir": target,
            "target_partitions": targets,
            "date_from": ref_params["date_from"],
            "date_to": ref_params["date_to"],
        }
    )
    RangeMaterialization(spark, params).run()

    got = spark.read.parquet(target).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    expected = _read_psv(spark, f"{m}/expected_data.psv", schema).unionByName(initial)
    assert _multiset_equal(got, expected)
    assert os.path.isdir(f"{target}/year=2017/month=3/day=15")
    assert os.path.isdir(f"{target}/year=2017/month=6/day=15")
    assert os.path.isdir(f"{target}/year=2017/month=2/day=15")


def test_full_materialization_leftovers_golden(spark, tmp_path):
    """MaterializationTest full_materialization/no_partitions: version
    retention must (a) keep num_versions_to_retain previous versions
    plus the new one, (b) delete older versions AND non-version
    leftovers (stray parquet files, partition dirs from pre-version
    layouts) that would otherwise poison the lexicographic ordering,
    (c) keep $folder$ markers of retained versions."""
    from m3d_engine_spark.operators.materialization import FullMaterialization

    m = f"{FEAT}/MaterializationTestRes/full_materialization"
    with open(f"{m}/no_partitions/params.json") as fh:
        ref_params = json.load(fh)
    schema = _schema(f"{m}/schema.json")
    _read_psv(spark, f"{m}/source_data.psv", schema).createOrReplaceTempView(
        "golden_mat_full_source"
    )
    base = tmp_path / "data"
    base.mkdir()
    # leftover part files + pre-version partition dirs + old versions
    for f in ("part-0001.parquet", "part-0002.parquet", "part-0003.parquet", "part-0004.parquet"):
        (base / f).touch()
    for d in ("year=2019", "year=2020", "20200101_124514_UTC",
              "20200102_123012_UTC", "20200103_114329_UTC", "20200201_103210_UTC"):
        (base / d).mkdir()
        (base / d / "sample_file.parquet").touch()
        (base / f"{d}_$folder$").touch()
    assert len(list(base.iterdir())) == 16

    params = ParamsFile(
        {
            "source_table": "golden_mat_full_source",
            "target_dir": str(base),
            "target_partitions": [],
            "num_versions_to_retain": ref_params["num_versions_to_retain"],
        }
    )
    algo = FullMaterialization(spark, params)
    algo.run()

    got = spark.read.parquet(algo.next_location).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    expected = _read_psv(spark, f"{m}/expected_data.psv", schema)
    assert _multiset_equal(got, expected)

    remaining = sorted(p.name for p in base.iterdir())
    new_version = algo.next_location.rsplit("/", 1)[1]
    assert remaining == sorted(
        [
            "20200103_114329_UTC", "20200103_114329_UTC_$folder$",
            "20200201_103210_UTC", "20200201_103210_UTC_$folder$",
            new_version,
        ]
    ), remaining


def test_algorithm_template_golden(spark, tmp_path):
    """AlgorithmTemplateTest: the template scenario is a non-partitioned
    FullLoad — new landing data fully replaces the pre-loaded lake;
    post-state equals the new data verbatim."""
    from m3d_engine_spark.operators.full_load import FullLoad

    a = f"{FEAT}/templates/AlgorithmTemplateTestRes"
    full_schema = _schema(f"{a}/target_schema.json")
    loc = str(tmp_path / "lake")
    _read_psv(spark, f"{a}/lake_data_pre.psv", full_schema).write.parquet(loc)

    params = ParamsFile(
        {
            "source_dir": f"{a}/new_data.psv",
            "file_format": "dsv",
            "delimiter": "|",
            "has_header": False,
            "target_location": loc,
            "schema": full_schema.jsonValue(),
        }
    )
    FullLoad(spark, params).run()

    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv(spark, f"{a}/lake_data_post.psv", full_schema)
    assert _multiset_equal(got, expected)


def test_gzip_decompressor_golden(spark, tmp_path):
    """GzipDecompressorTest: decompressed outputs drop the .gz/.zip
    suffix, byte-match the reference's own uncompressed twins, the
    compressed originals are deleted, and sizes increase."""
    import shutil

    from m3d_engine_spark.operators.gzip_decompressor import (
        decompress_directory_hadoop,
    )

    g = f"{FEAT}/GzipDecompressorTestRes"
    landing = tmp_path / "landing"
    landing.mkdir()
    compressed = [
        "data_20180719111849_data_1-3.gz",
        "data_20180719111849_data_2-3.gz",
        "data_20180719111849_data_3-3.zip",
    ]
    sizes = {}
    for f in compressed:
        shutil.copy(f"{g}/{f}", landing / f)
        sizes[f] = (landing / f).stat().st_size

    out = sorted(decompress_directory_hadoop(spark, f"file://{landing}", thread_pool_size=3))
    assert [p.rsplit("/", 1)[1] for p in out] == [
        "data_20180719111849_data_1-3",
        "data_20180719111849_data_2-3",
        "data_20180719111849_data_3-3",
    ]
    for f in compressed:
        stem = f.rsplit(".", 1)[0]
        got = (landing / stem).read_bytes()
        expected = open(f"{g}/{stem}", "rb").read()
        # the checked-in twins are git-newline-normalized (LF) while the
        # archives hold CRLF — compare content, not line endings
        assert got.replace(b"\r\n", b"\n") == expected.replace(b"\r\n", b"\n"), stem
        assert len(got) > sizes[f]
        assert not (landing / f).exists()


def test_range_materialization_year_month_golden(spark, tmp_path):
    """MaterializationTest year/month schema: bounds in the reference's
    yyyy-MM format, stepped by months."""
    from m3d_engine_spark.operators.materialization import RangeMaterialization

    m = f"{FEAT}/MaterializationTestRes/range_materialization/year_month"
    with open(f"{m}/params.json") as fh:
        ref_params = json.load(fh)
    schema = _schema(f"{m}/schema.json")
    _read_psv(spark, f"{m}/source_data.psv", schema).createOrReplaceTempView(
        "golden_mat_ym_source"
    )
    target = str(tmp_path / "mart")
    params = ParamsFile(
        {
            "source_table": "golden_mat_ym_source",
            "target_dir": target,
            "target_partitions": ref_params["target_partitions"],
            "date_from": ref_params["date_from"],
            "date_to": ref_params["date_to"],
        }
    )
    RangeMaterialization(spark, params).run()
    got = spark.read.parquet(target).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    expected = _read_psv(spark, f"{m}/expected_data.psv", schema)
    assert _multiset_equal(got, expected)


def test_range_materialization_year_week_golden(spark, tmp_path):
    """MaterializationTest year/week schema: bounds in yyyy-ww (ISO
    week-of-weekyear), initial foreign partitions preserved."""
    from m3d_engine_spark.operators.materialization import RangeMaterialization

    m = f"{FEAT}/MaterializationTestRes/range_materialization/year_week"
    with open(f"{m}/params.json") as fh:
        ref_params = json.load(fh)
    schema = _schema(f"{m}/schema.json")
    targets = ref_params["target_partitions"]
    _read_psv(spark, f"{m}/source_data.psv", schema).createOrReplaceTempView(
        "golden_mat_yw_source"
    )
    target = str(tmp_path / "mart")
    initial = _read_psv(spark, f"{m}/initial_data.psv", schema)
    initial.write.partitionBy(*targets).parquet(target)

    params = ParamsFile(
        {
            "source_table": "golden_mat_yw_source",
            "target_dir": target,
            "target_partitions": targets,
            "date_from": ref_params["date_from"],
            "date_to": ref_params["date_to"],
        }
    )
    RangeMaterialization(spark, params).run()
    got = spark.read.parquet(target).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    # expected_data.psv already contains the initial (week 7) rows
    expected = _read_psv(spark, f"{m}/expected_data.psv", schema)
    assert _multiset_equal(got, expected)
    for w in (1, 2, 3, 4, 7):
        assert os.path.isdir(f"{target}/year=2017/week={w}")


def test_range_materialization_year_week_day_raises(spark, tmp_path):
    """MaterializationTest year/week/day schema: unsupported range
    granularity must raise, as in the reference."""
    from m3d_engine_spark.operators.materialization import RangeMaterialization

    m = f"{FEAT}/MaterializationTestRes/range_materialization/year_week_day"
    with open(f"{m}/params.json") as fh:
        ref_params = json.load(fh)
    schema = _schema(f"{m}/schema.json")
    _read_psv(spark, f"{m}/source_data.psv", schema).createOrReplaceTempView(
        "golden_mat_ywd_source"
    )
    params = ParamsFile(
        {
            "source_table": "golden_mat_ywd_source",
            "target_dir": str(tmp_path / "mart"),
            "target_partitions": ref_params["target_partitions"],
            "date_from": ref_params["date_from"],
            "date_to": ref_params["date_to"],
        }
    )
    with pytest.raises(Exception):
        RangeMaterialization(spark, params).run()


def _run_append_golden(spark, tmp_path, res_dir, files, params_name="params.json",
                       pre_headers=(), extra_params=None):
    """Shared AppendLoad golden harness: seed the lake from
    lake_data_pre.psv, copy landing files (+optional pre-seeded
    headers), run, return (got, expected, paths)."""
    import shutil

    from m3d_engine_spark.operators.append_load import AppendLoad

    a = f"{FEAT}/loads/AppendLoadTestRes/{res_dir}"
    with open(f"{a}/{params_name}") as fh:
        ref_params = json.load(fh)
    full_schema = _schema(f"{a}/target_schema.json")
    targets = ref_params["target_partitions"]

    loc = str(tmp_path / "lake")
    _read_psv(spark, f"{a}/lake_data_pre.psv", full_schema).write.partitionBy(
        *targets
    ).parquet(loc)

    landing = tmp_path / "landing"
    for f in files:
        dst = landing / f
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(f"{a}/{f.rsplit('/', 1)[-1]}", dst)
    for rel, src_schema in pre_headers:
        hp = tmp_path / "headers" / rel
        hp.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(f"{a}/{src_schema}", hp)

    params = {
        "source_dir": str(landing),
        "header_dir": str(tmp_path / "headers"),
        "file_format": ref_params.get("file_format", "dsv"),
        "delimiter": ref_params.get("delimiter", "|"),
        "has_header": ref_params.get("has_header", False),
        "regex_filename": ref_params["regex_filename"],
        "target_partitions": targets,
        "target_location": loc,
        "schema": full_schema.jsonValue(),
    }
    params.update(extra_params or {})
    AppendLoad(spark, ParamsFile(params)).run()

    got = spark.read.option("mergeSchema", "true").parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv(spark, f"{a}/lake_data_post.psv", full_schema)
    return got, expected


def test_append_load_multiple_source_files_golden(spark, tmp_path):
    """AppendLoadTest multiple_source_files: two part files of one
    partition load as a single header group."""
    got, expected = _run_append_golden(
        spark, tmp_path, "multiple_source_files",
        ["data_20180101-part-00000.psv", "data_20180101-part-00001.psv"],
    )
    assert _multiset_equal(got, expected)
    assert (tmp_path / "headers/year=2018/month=1/day=1/header.json").exists()


def test_append_load_missing_columns_golden(spark, tmp_path):
    """AppendLoadTest missing_columns: landing carries a column the
    target lacks (date1) and misses target columns — the extra column is
    dropped, missing ones load as NULL."""
    got, expected = _run_append_golden(
        spark, tmp_path, "missing_columns", ["data_20180422-00001.psv"]
    )
    assert _multiset_equal(got, expected)


def test_append_load_partition_from_full_path_golden(spark, tmp_path):
    """AppendLoadTest partition_from_full_path: landing files carry no
    date in the NAME — partitions come from the hive-style directory
    path (year=2018/month=01/day=01), zero-padded values cast to int."""
    got, expected = _run_append_golden(
        spark, tmp_path, "partition_from_full_path",
        ["year=2018/month=01/day=01/data-nodate-part-00000.psv",
         "year=2018/month=01/day=01/data-nodate-part-00001.psv"],
    )
    assert _multiset_equal(got, expected)


def test_append_load_similar_schemas_golden(spark, tmp_path):
    """AppendLoadTest similar_schemas: one group reads via its
    pre-seeded header.json, the other falls back to the target schema;
    both header files exist afterwards with the expected schemas."""
    got, expected = _run_append_golden(
        spark, tmp_path, "similar_schemas",
        ["data_20180101-part-00000.psv", "data_20180105-part-00000.psv"],
        pre_headers=[("year=2018/month=1/day=1/header.json", "20180101_schema.json")],
    )
    assert _multiset_equal(got, expected)
    a = f"{FEAT}/loads/AppendLoadTestRes/similar_schemas"
    with open(tmp_path / "headers/year=2018/month=1/day=1/header.json") as fh:
        h1 = StructType.fromJson(json.load(fh))
    with open(tmp_path / "headers/year=2018/month=1/day=5/header.json") as fh:
        h5 = StructType.fromJson(json.load(fh))
    assert h1 == _schema(f"{a}/20180101_schema.json")
    full = _schema(f"{a}/target_schema.json")
    assert h5 == StructType(full.fields[:-3])


def _run_delta_lake_golden(spark, tmp_path, res_dir, params_name=None,
                           extra_params=None):
    """Init + merge run of DeltaLakeLoad over one fixture dir; returns
    (lake DataFrame cast to lake_schema, control DataFrame)."""
    import shutil

    from m3d_engine_spark.operators.delta_lake_load import DeltaLakeLoadAlgorithm

    d = f"{FEAT}/loads/DeltaLakeLoadTestRes"
    a = f"{d}/{res_dir}"
    pfile = f"{a}/params.json" if params_name is None else f"{a}/{params_name}"
    if not os.path.exists(pfile):
        pfile = f"{d}/params.json"
    with open(pfile) as fh:
        ref_params = json.load(fh)
    lake_schema = _schema(f"{a}/lake_schema.json")

    lake = str(tmp_path / "lake")
    delta_dir = str(tmp_path / "delta_table")

    def run(batch_file: str) -> None:
        land = tmp_path / "landing"
        shutil.rmtree(land, ignore_errors=True)
        land.mkdir()
        shutil.copy(batch_file, land / "batch.psv")
        params = {
            "source_dir": str(land),
            "file_format": ref_params["file_format"],
            "delimiter": ref_params["delimiter"],
            "has_header": ref_params["has_header"],
            "delta_table_dir": delta_dir,
            "target_location": lake,
            "business_key": ref_params["business_key"],
            "condensation_key": ref_params["condensation_key"],
            "record_mode_column": ref_params["record_mode_column"],
            "target_partitions": ref_params["target_partitions"],
        }
        if ref_params.get("partition_column"):
            params["partition_column"] = ref_params["partition_column"]
            params["partition_column_format"] = ref_params["partition_column_format"]
        params.update(extra_params or {})
        if "affected_partitions_merge" in ref_params:
            params["affected_partitions_merge"] = ref_params["affected_partitions_merge"]
        DeltaLakeLoadAlgorithm(spark, params if isinstance(params, ParamsFile) else ParamsFile(params)).run()

    run(f"{a}/init_data.psv")
    run(f"{a}/new_data.psv")

    got = spark.read.option("mergeSchema", "true").parquet(lake).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in lake_schema.fields]
    )
    control = _read_psv_header(spark, f"{a}/control_data.psv", lake_schema)
    return got, control


@pytest.mark.slow
def test_delta_lake_load_removed_columns_golden(spark, tmp_path):
    """DeltaLakeLoadTest removed_columns: the second delta batch no
    longer carries a column — merge pads it with NULLs, lake matches
    control."""
    got, control = _run_delta_lake_golden(spark, tmp_path, "removed_columns")
    assert _multiset_equal(got, control)


def test_delta_lake_load_nonpartitioned_golden(spark, tmp_path):
    """DeltaLakeLoadTest nonpartitioned: no target partitions — merge
    rewrites the whole (small) delta table; lake matches control."""
    got, control = _run_delta_lake_golden(spark, tmp_path, "nonpartitioned")
    assert _multiset_equal(got, control)


@pytest.mark.slow
def test_delta_lake_load_unstable_partitions_right_params_golden(spark, tmp_path):
    """DeltaLakeLoadTest unstable partitions, affected_partitions_merge
    = true: partition values changed for two business keys between
    batches; the merge keyed on business keys + affected-partitions
    scope (computed from the RAW batch, whose old-image records still
    name the old partitions) relocates the rows — lake equals control
    exactly."""
    got, control = _run_delta_lake_golden(
        spark, tmp_path, "unstable_partitions_right_params"
    )
    assert _multiset_equal(got, control)


@pytest.mark.slow
def test_delta_lake_load_unstable_partitions_wrong_params_golden(spark, tmp_path):
    """DeltaLakeLoadTest unstable partitions, affected_partitions_merge
    = false: partition columns join the merge key, so the old-partition
    rows are never matched — exactly two stale duplicates survive and
    the table does NOT match control (the reference pins this failure
    mode as documented behavior)."""
    got, control = _run_delta_lake_golden(
        spark, tmp_path, "unstable_partitions_wrong_params"
    )
    assert got.count() == control.count() + 2
    assert not _multiset_equal(got, control)


def _full_load_nested_golden(spark, tmp_path, params_name, schema_name, data_name,
                             expected_name):
    from m3d_engine_spark.operators.full_load import FullLoad

    n = f"{REF}/nested_flattener"
    with open(f"{n}/{params_name}") as fh:
        ref_params = json.load(fh)
    tgt_schema = _schema(f"{n}/{schema_name}")
    loc = str(tmp_path / "lake")
    pd = {
        "source_dir": f"{n}/{data_name}",
        "file_format": "json",
        "multi_line": ref_params.get("multi_line", False),
        "target_location": loc,
        "additional_task": ref_params["additional_task"],
        "target_schema": tgt_schema.jsonValue(),
    }
    if "schema" in ref_params:
        pd["schema"] = ref_params["schema"]
    params = ParamsFile(pd)
    FullLoad(spark, params).run()
    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in tgt_schema.fields]
    )
    expected = _read_psv(spark, f"{n}/{expected_name}", tgt_schema)
    assert _multiset_equal(got, expected)


def test_full_load_nested_flattener_golden(spark, tmp_path):
    """FullLoadTest 'nested with nested flattener only': deep-nested
    JSON flattened + renamed in-load (additional_task chain), result
    equals the reference's expected extend PSV."""
    _full_load_nested_golden(
        spark, tmp_path, "params_normal_scenario.json",
        "target_schema_extend.json", "data_normal_test.json",
        "expected_target_data_extend.psv",
    )


def test_full_load_nested_flattener_transpose_golden(spark, tmp_path):
    """FullLoadTest 'nested with nested flattener and transpose': the
    full in-load reshaping chain — side-flatten, rename, transpose,
    enforce_schema — against the reference's expected PSV."""
    _full_load_nested_golden(
        spark, tmp_path, "params_transpose_scenario.json",
        "target_schema_transpose_scenario.json", "data_transpose_test.json",
        "expected_target_data_tranpose.psv",
    )


def test_full_load_multi_column_partitions_golden(spark, tmp_path):
    """FullLoadTest 'partitioned by multiple non-derived columns':
    empty partition_column — customer/date are already data columns, no
    date derivation; post-state matches."""
    m = f"{REF}/partitioned_multi_columns"
    full_schema = _schema(f"{m}/target_schema.json")
    loc = str(tmp_path / "out")
    params = ParamsFile(
        {
            "source_dir": f"{REF}/landing/new_data_multi_partition_columns.psv",
            "file_format": "dsv",
            "delimiter": "|",
            "has_header": False,
            "target_location": loc,
            "schema": full_schema.jsonValue(),
            "target_partitions": ["customer", "date"],
            "partition_column": "",
            "partition_column_format": "",
        }
    )
    FullLoad(spark, params).run()
    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv(spark, f"{m}/lake_data_post.psv", full_schema)
    assert _multiset_equal(got, expected)
    assert os.path.isdir(f"{loc}/customer=customer5/date=20180110")


def test_full_load_wrong_date_format_sentinels_golden(spark, tmp_path):
    """FullLoadTest 'date format is wrong': ddMMyy against yyyyMMdd data
    does NOT fail — derivation emits the 9999/99/99 sentinel partition,
    matching the reference's expected post-state."""
    m = f"{REF}/partitioned_date_format_wrong"
    full_schema = _schema(f"{m}/target_schema.json")
    targets = ["year", "month", "day"]
    landing_schema = StructType([f for f in full_schema.fields if f.name not in targets])
    loc = str(tmp_path / "out")
    params = ParamsFile(
        {
            "source_dir": f"{REF}/landing/new_data.psv",
            "file_format": "dsv",
            "delimiter": "|",
            "has_header": False,
            "target_location": loc,
            "schema": landing_schema.jsonValue(),
            "target_partitions": targets,
            "partition_column": "date",
            "partition_column_format": "ddMMyy",
        }
    )
    FullLoad(spark, params).run()
    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv(spark, f"{m}/lake_data_post.psv", full_schema)
    assert _multiset_equal(got, expected)
    assert os.path.isdir(f"{loc}/year=9999/month=99/day=99")


def test_full_load_missing_partition_column_raises(spark, tmp_path):
    """FullLoadTest 'partitioning column is missing': the named
    partition_column does not exist in the data — the load must fail
    and write nothing."""
    m = f"{REF}/partitioned"
    full_schema = _schema(f"{m}/target_schema.json")
    targets = ["year", "month", "day"]
    landing_schema = StructType([f for f in full_schema.fields if f.name not in targets])
    loc = str(tmp_path / "out")
    params = ParamsFile(
        {
            "source_dir": f"{REF}/landing/new_data.psv",
            "file_format": "dsv",
            "delimiter": "|",
            "has_header": False,
            "target_location": loc,
            "schema": landing_schema.jsonValue(),
            "target_partitions": targets,
            "partition_column": "date_missing_column",
            "partition_column_format": "yyyyMMdd",
        }
    )
    with pytest.raises(Exception):
        FullLoad(spark, params).run()
    assert not os.path.isdir(f"{loc}/year=2018")


def test_full_load_failfast_malformed_raises(spark, tmp_path):
    """FullLoadTest failfast_option: FAILFAST + malformed rows aborts
    the load (reader_mode defaults to FAILFAST for full loads,
    FullLoadConfiguration.scala:85)."""
    m = f"{REF}/failfast_option"
    full_schema = _schema(f"{m}/target_schema.json")
    targets = ["year", "month", "day"]
    landing_schema = StructType([f for f in full_schema.fields if f.name not in targets])
    loc = str(tmp_path / "out")
    params = ParamsFile(
        {
            "source_dir": f"{m}/new_data_wrong.psv",
            "file_format": "dsv",
            "delimiter": "|",
            "has_header": False,
            "target_location": loc,
            "schema": landing_schema.jsonValue(),
            "target_partitions": targets,
            "partition_column": "date",
            "partition_column_format": "yyyyMMdd",
        }
    )
    with pytest.raises(Exception):
        FullLoad(spark, params).run()


def test_full_load_invalid_reader_mode_raises(spark, tmp_path):
    """FullLoadTest: an invalid reader_mode string must be rejected."""
    m = f"{REF}/failfast_option"
    full_schema = _schema(f"{m}/target_schema.json")
    params = ParamsFile(
        {
            "source_dir": f"{m}/new_data_wrong.psv",
            "file_format": "dsv",
            "delimiter": "|",
            "has_header": False,
            "target_location": str(tmp_path / "out"),
            "schema": full_schema.jsonValue(),
            "reader_mode": "invalid_mode",
        }
    )
    with pytest.raises(Exception):
        FullLoad(spark, params).run()


# --- DeltaLoadTest: remaining scenarios --------------------------------

DELTA_RES = f"{FEAT}/loads/DeltaLoadTestRes"


def _read_psv_infer(spark, path: str):
    """DSV with header + inferSchema, the reference's dsvReader
    (FileReader.scala:18-30) used by the csv_test scenarios."""
    return (
        spark.read.option("delimiter", "|")
        .option("header", True)
        .option("inferSchema", True)
        .csv(path)
    )


def _run_parquet_delta_scenario(spark, tmp_path, scenario: str, with_pre: bool = True):
    """DeltaLoadTest parquet scenario harness: delta psv read with the
    fixture schema POSITIONALLY (short rows → trailing NULLs, matching
    createParquetFileFromDSVfileandWriteToHDSF, DeltaLoadTest.scala:215-231),
    written to parquet, merged into the pre-loaded active table."""
    from m3d_engine_spark.operators.delta_load import DeltaLoadAlgorithm

    d = f"{DELTA_RES}/{scenario}"
    active_schema = _schema(f"{d}/active_data_schema.json")
    delta_schema = _schema(f"{d}/delta_data_schema.json")

    loc = str(tmp_path / "active")
    if with_pre:
        _read_psv_header(spark, f"{d}/active_data_pre.psv", active_schema).write.partitionBy(
            "year", "month", "day"
        ).parquet(loc)
        active = spark.read.parquet(loc)
    else:
        active = spark.createDataFrame([], active_schema)
    active.createOrReplaceTempView("golden_delta_active")

    delta_loc = str(tmp_path / "delta")
    (
        spark.read.schema(delta_schema)
        .option("header", True)
        .option("delimiter", "|")
        .csv(f"{d}/delta_data.psv")
        .write.parquet(delta_loc)
    )

    params = ParamsFile(
        {
            "active_records_table_lake": "golden_delta_active",
            "delta_records_file_path": delta_loc,
            "business_key": ["salesorder", "item"],
            "technical_key": ["actrequest_timestamp", "datapakid", "partno", "record"],
            "record_mode_column": "recordmode",
            "target_partitions": ["year", "month", "day"],
            "partition_column": "date",
            "partition_column_format": "yyyyMMdd",
            "target_location": loc,
        }
    )
    DeltaLoadAlgorithm(spark, params).run()

    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in active_schema.fields]
    )
    expected = _read_psv_header(spark, f"{d}/active_data_post.psv", active_schema)
    assert _multiset_equal(got, expected)


def test_delta_load_init_golden(spark, tmp_path):
    """DeltaLoadTest 'Delta Init': empty active table — the whole
    condensed delta (minus deletes) becomes the table."""
    _run_parquet_delta_scenario(spark, tmp_path, "parquet_test_delta_init", with_pre=False)


def test_delta_load_merge_unpartitioned_golden(spark, tmp_path):
    """DeltaLoadTest 'Delta Merge Unpartitioned'."""
    _run_parquet_delta_scenario(spark, tmp_path, "parquet_test_delta_merge_unpartitioned")


def test_delta_load_merge_additional_columns_golden(spark, tmp_path):
    """DeltaLoadTest 'Delta Merge with additional columns': the delta's
    extra 'discount' column is projected away — output keeps exactly the
    active table's columns (DeltaLoad.scala:76-80 selectExpr)."""
    _run_parquet_delta_scenario(spark, tmp_path, "parquet_test_delta_merge_additional_columns")


def test_delta_load_merge_missing_columns_golden(spark, tmp_path):
    """DeltaLoadTest 'Delta Merge with missing columns': delta rows are
    SHORTER than the declared schema — 'amount' reads as NULL and the
    merged rows carry that NULL into the lake."""
    _run_parquet_delta_scenario(spark, tmp_path, "parquet_test_delta_merge_missing_columns")


def _run_csv_delta_scenario(spark, tmp_path, targets, derive: bool):
    """csv_test scenarios: delta comes from a LAKE TABLE
    (delta_records_table_lake) whose data already carries the partition
    columns — no date derivation happens (DeltaLoad.scala:85-92)."""
    from m3d_engine_spark.operators.delta_load import DeltaLoadAlgorithm

    d = f"{DELTA_RES}/csv_test"
    pre = _read_psv_infer(spark, f"{d}/active_data_pre.psv")

    loc = str(tmp_path / "active")
    pre.write.partitionBy(*targets).parquet(loc)
    spark.read.parquet(loc).createOrReplaceTempView("golden_delta_active")
    _read_psv_infer(spark, f"{d}/delta_data.psv").createOrReplaceTempView(
        "golden_delta_delta"
    )

    params = ParamsFile(
        {
            "active_records_table_lake": "golden_delta_active",
            "delta_records_table_lake": "golden_delta_delta",
            "business_key": ["salesorder", "item"],
            "technical_key": ["actrequest_timestamp", "datapakid", "partno", "record"],
            "record_mode_column": "recordmode",
            "target_partitions": list(targets),
            "partition_column": "date" if derive else "",
            "partition_column_format": "yyyyMMdd" if derive else "",
            "target_location": loc,
        }
    )
    DeltaLoadAlgorithm(spark, params).run()

    expected = _read_psv_infer(spark, f"{d}/active_data_post.psv")
    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in expected.schema.fields]
    )
    assert _multiset_equal(got, expected)


def test_delta_load_csv_date_partitions_golden(spark, tmp_path):
    """DeltaLoadTest 'partitioned by date/time columns' (csv_test):
    partition columns already present in the delta data."""
    _run_csv_delta_scenario(spark, tmp_path, ["year", "month", "day"], derive=True)


def test_delta_load_csv_customer_partition_golden(spark, tmp_path):
    """DeltaLoadTest 'partitioned by customer' (csv_test): partitioning
    by an existing non-date column, empty partition_column."""
    _run_csv_delta_scenario(spark, tmp_path, ["customer"], derive=False)


# --- SemiStructuredLoadTest: remaining scenarios ------------------------

SEMI = f"{FEAT}/loads/SemiStructuredLoadTestRes"


def _semi_ref(scenario: str, params_name: str = "params.json") -> dict:
    with open(f"{SEMI}/{scenario}/{params_name}") as fh:
        return json.load(fh)


def _semi_lake_pre(spark, tmp_path, scenario: str, schema: StructType) -> str:
    lake = str(tmp_path / "lake")
    pre = spark.read.schema(schema).json(f"{SEMI}/{scenario}/lake_data_pre.txt")
    pre.write.partitionBy("year", "month", "day").parquet(lake)
    return lake


def _semi_params(tmp_path, ref: dict, lake: str) -> ParamsFile:
    d = {
        "source_dir": str(tmp_path / "landing"),
        "header_dir": str(tmp_path / "headers"),
        "file_format": ref["file_format"],
        "data_type": ref.get("data_type", "semistructured"),
        "regex_filename": ref["regex_filename"],
        "target_partitions": ref["target_partitions"],
        "target_dir": lake,
        "schema": ref["schema"],
    }
    if "verify_schema" in ref:
        d["verify_schema"] = ref["verify_schema"]
    return ParamsFile(d)


def _land(tmp_path, scenario: str, filename: str, day_dir: str) -> None:
    import shutil

    dest = tmp_path / "landing" / day_dir
    dest.mkdir(parents=True, exist_ok=True)
    shutil.copy(f"{SEMI}/{scenario}/{filename}", dest / filename)


def _semi_got(spark, lake: str, schema: StructType):
    return spark.read.schema(schema).parquet(lake)


def test_semistructured_nested_json_load_golden(spark, tmp_path):
    """SemiStructuredLoadTest nested scenario: JSON with a nested
    'location' struct, partitions regex-extracted from the path."""
    from m3d_engine_spark.operators.append_load import AppendLoad

    s = "semistructured_nested_json_load"
    ref = _semi_ref(s)
    schema = StructType.fromJson(ref["schema"])
    lake = _semi_lake_pre(spark, tmp_path, s, schema)
    _land(tmp_path, s, "data-nodate-part-00001.txt", "year=2018/month=01/day=02")

    AppendLoad(spark, _semi_params(tmp_path, ref, lake)).run()

    expected = spark.read.schema(schema).json(f"{SEMI}/{s}/lake_data_post.txt")
    assert _multiset_equal(_semi_got(spark, lake, schema), expected)
    assert os.path.isfile(
        str(tmp_path / "headers" / "year=2018" / "month=1" / "day=2" / "header.json")
    )


def test_semistructured_parquet_load_golden(spark, tmp_path):
    """SemiStructuredLoadTest parquet scenario: landing PARQUET files,
    partitions from the path."""
    from m3d_engine_spark.operators.append_load import AppendLoad

    s = "semistructured_parquet_test"
    ref = _semi_ref(s)
    schema = StructType.fromJson(ref["schema"])
    lake = _semi_lake_pre(spark, tmp_path, s, schema)
    _land(tmp_path, s, "sales.parquet", "year=2018/month=01/day=02")

    AppendLoad(spark, _semi_params(tmp_path, ref, lake)).run()

    expected = spark.read.schema(schema).json(f"{SEMI}/{s}/lake_data_post.txt")
    assert _multiset_equal(_semi_got(spark, lake, schema), expected)


def test_semistructured_evolving_schema_golden(spark, tmp_path):
    """SemiStructuredLoadTest evolving schema: second load arrives with
    an EVOLVED target schema (adds 'city'); earlier partitions read back
    with NULL city; final state matches the reference post file read
    with the evolved schema."""
    from m3d_engine_spark.operators.append_load import AppendLoad

    s = "semistructured_json_load_evolving_schema"
    ref = _semi_ref(s)
    schema = StructType.fromJson(ref["schema"])
    lake = _semi_lake_pre(spark, tmp_path, s, schema)
    _land(tmp_path, s, "data-nodate-part-00001.txt", "year=2018/month=01/day=02")
    AppendLoad(spark, _semi_params(tmp_path, ref, lake)).run()

    ref2 = _semi_ref(s, "params_evolved.json")
    evolved = StructType.fromJson(ref2["schema"])
    _land(tmp_path, s, "data-nodate-part-00002.txt", "year=2018/month=01/day=03")
    AppendLoad(spark, _semi_params(tmp_path, ref2, lake)).run()

    expected = spark.read.schema(evolved).json(f"{SEMI}/{s}/lake_data_post.txt")
    assert _multiset_equal(_semi_got(spark, lake, evolved), expected)
    assert os.path.isfile(
        str(tmp_path / "headers" / "year=2018" / "month=1" / "day=2" / "header.json")
    )


def test_semistructured_dropping_column_golden(spark, tmp_path):
    """SemiStructuredLoadTest dropping columns: second load's target
    schema DROPPED a column; new partitions load under the narrower
    schema and the final lake matches post read with it."""
    import shutil

    from m3d_engine_spark.operators.append_load import AppendLoad

    s = "semistructured_json_load_dropping_column"
    ref = _semi_ref(s)
    schema = StructType.fromJson(ref["schema"])
    lake = _semi_lake_pre(spark, tmp_path, s, schema)
    _land(tmp_path, s, "data-nodate-part-00001.txt", "year=2018/month=01/day=02")
    AppendLoad(spark, _semi_params(tmp_path, ref, lake)).run()

    shutil.rmtree(tmp_path / "landing")
    ref2 = _semi_ref(s, "params_column_dropped.json")
    dropped = StructType.fromJson(ref2["schema"])
    _land(tmp_path, s, "data-nodate-part-00002.txt", "year=2018/month=01/day=03")
    _land(tmp_path, s, "data-nodate-part-00003.txt", "year=2018/month=01/day=04")
    AppendLoad(spark, _semi_params(tmp_path, ref2, lake)).run()

    expected = spark.read.schema(dropped).json(f"{SEMI}/{s}/lake_data_post.txt")
    assert _multiset_equal(_semi_got(spark, lake, dropped), expected)
    assert os.path.isfile(
        str(tmp_path / "headers" / "year=2018" / "month=1" / "day=3" / "header.json")
    )


def test_semistructured_mismatching_schema_raises(spark, tmp_path):
    """SemiStructuredLoadTest 'more columns than target schema': the
    load fails with the reference's exact message and writes NOTHING —
    no header, no target partition."""
    from m3d_engine_spark.operators.append_load import AppendLoad

    s = "semistructured_json_load_mismatching_schema"
    ref = _semi_ref(s)
    schema = StructType.fromJson(ref["schema"])
    lake = _semi_lake_pre(spark, tmp_path, s, schema)
    _land(tmp_path, s, "data-nodate-part-00001.txt", "year=2018/month=01/day=02")

    with pytest.raises(
        RuntimeError,
        match="Schema does not match the input data for some of the input folders.",
    ):
        AppendLoad(spark, _semi_params(tmp_path, ref, lake)).run()

    expected = spark.read.schema(schema).json(f"{SEMI}/{s}/lake_data_post.txt")
    assert _multiset_equal(_semi_got(spark, lake, schema), expected)
    assert not os.path.isdir(str(tmp_path / "headers" / "year=2018"))
    assert not os.path.isdir(f"{lake}/year=2018/month=1/day=2")


def test_semistructured_wrong_configuration_raises(spark, tmp_path):
    """SemiStructuredLoadTest wrong configuration: data_type
    'unstructured' is rejected with the reference's exact message."""
    from m3d_engine_spark.operators.append_load import AppendLoad

    s = "semistructured_json_load_wrong_configuration"
    ref = _semi_ref(s)
    with pytest.raises(RuntimeError, match="Unsupported data type: unstructured"):
        params = ParamsFile(
            {
                "source_dir": str(tmp_path / "landing"),
                "header_dir": str(tmp_path / "headers"),
                "file_format": ref["file_format"],
                "data_type": ref["data_type"],
                "regex_filename": ref["regex_filename"],
                "target_partitions": ref["target_partitions"],
                "target_dir": str(tmp_path / "lake"),
            }
        )
        AppendLoad(spark, params).run()


def test_semistructured_existing_header_golden(spark, tmp_path):
    """SemiStructuredLoadTest 'some header files are available and
    schemas are the same': the pre-existing header file is PRESERVED
    verbatim (never overwritten) and the new partition's header equals
    the target schema minus partition columns."""
    from m3d_engine_spark.operators.append_load import AppendLoad

    s = "semistructured_load_with_existing_header"
    ref = _semi_ref(s)
    schema = StructType.fromJson(ref["schema"])
    lake = _semi_lake_pre(spark, tmp_path, s, schema)

    hdr_day1 = tmp_path / "headers" / "year=2018" / "month=1" / "day=1"
    hdr_day1.mkdir(parents=True)
    with open(f"{SEMI}/{s}/20180101_schema.json") as fh:
        original_header = fh.read()
    (hdr_day1 / "header.json").write_text(original_header)

    _land(tmp_path, s, "data-nodate-part-00001.txt", "year=2018/month=01/day=01")
    _land(tmp_path, s, "data-nodate-part-00002.txt", "year=2018/month=01/day=02")

    AppendLoad(spark, _semi_params(tmp_path, ref, lake)).run()

    expected = spark.read.schema(schema).json(f"{SEMI}/{s}/lake_data_post.txt")
    assert _multiset_equal(_semi_got(spark, lake, schema), expected)

    got_day1 = StructType.fromJson(json.loads((hdr_day1 / "header.json").read_text()))
    assert got_day1 == StructType.fromJson(json.loads(original_header))
    hdr_day2 = tmp_path / "headers" / "year=2018" / "month=1" / "day=2" / "header.json"
    stripped_target = StructType(
        [f for f in schema.fields if f.name not in ref["target_partitions"]]
    )
    assert StructType.fromJson(json.loads(hdr_day2.read_text())) == stripped_target


# --- FixedSizeStringExtractorTest: remaining scenarios ------------------

FSE = f"{FEAT}/FixedSizeStringExtractorTestRes"


def test_fixed_size_extractor_partitioned_golden(spark, tmp_path):
    """FixedSizeStringExtractorTest 'partitioning type is year/month':
    select_conditions in the reference's "col=value" string form scope
    the scan to year=2019/month=2, partition columns pass through, and
    the output lands in the target schema's column order."""
    from m3d_engine_spark.operators.fixed_size_extractor import (
        FixedSizeStringExtractorAlgorithm,
    )

    t = f"{FSE}/matched_schema_partitioned"
    with open(f"{t}/params.json") as fh:
        ref_params = json.load(fh)
    src_schema = _schema(f"{t}/source_schema.json")
    tgt_schema = _schema(f"{t}/target_schema.json")
    (
        spark.read.schema(src_schema)
        .option("delimiter", "|")
        .csv(f"{t}/source_data.psv")
        .createOrReplaceTempView("golden_fse_part_source")
    )
    params = ParamsFile(
        {
            "source_table": "golden_fse_part_source",
            "source_field": ref_params["source_field"],
            "substring_positions": ref_params["substring_positions"],
            "target_partitions": ref_params["target_partitions"],
            "select_conditions": ref_params["select_conditions"],
            "target_schema": tgt_schema.jsonValue(),
            "target_location": str(tmp_path / "out"),
        }
    )
    FixedSizeStringExtractorAlgorithm(spark, params).run()
    got = spark.read.parquet(str(tmp_path / "out")).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in tgt_schema.fields]
    )
    expected = _read_psv(spark, f"{t}/lake_data_post.psv", tgt_schema)
    assert _multiset_equal(got, expected)


@pytest.mark.parametrize("res_dir", ["non_matched_schema1", "non_matched_schema2"])
def test_fixed_size_extractor_position_mismatch_raises(spark, tmp_path, res_dir):
    """FixedSizeStringExtractorTest non_matched_schema1/2: fewer or more
    substring_positions than non-partition target fields must abort with
    the reference's 'Field positions do not correspond' failure."""
    from m3d_engine_spark.operators.fixed_size_extractor import (
        FixedSizeStringExtractorAlgorithm,
    )

    t = f"{FSE}/{res_dir}"
    with open(f"{t}/params.json") as fh:
        ref_params = json.load(fh)
    src_schema = _schema(f"{t}/source_schema.json")
    tgt_schema = _schema(f"{t}/target_schema.json")
    spark.createDataFrame([], src_schema).createOrReplaceTempView(
        "golden_fse_mismatch_source"
    )
    params = ParamsFile(
        {
            "source_table": "golden_fse_mismatch_source",
            "source_field": ref_params["source_field"],
            "substring_positions": ref_params["substring_positions"],
            "target_partitions": ref_params["target_partitions"],
            "target_schema": tgt_schema.jsonValue(),
            "target_location": str(tmp_path / "out"),
        }
    )
    with pytest.raises(Exception, match="do not correspond to the target schema"):
        FixedSizeStringExtractorAlgorithm(spark, params).run()


# --- FullLoadTest: reader-mode + failure-restore scenarios --------------


def _full_load_params(loc, schema, source, reader_mode=None, partitioned=False):
    p = {
        "source_dir": source,
        "file_format": "dsv",
        "delimiter": "|",
        "has_header": False,
        "target_location": loc,
        "schema": schema.jsonValue(),
    }
    if reader_mode:
        p["reader_mode"] = reader_mode
    if partitioned:
        p.update(
            target_partitions=["year", "month", "day"],
            partition_column="date",
            partition_column_format="yyyyMMdd",
        )
    return ParamsFile(p)


def test_full_load_failfast_clean_golden(spark, tmp_path):
    """FullLoadTest 'FailFast and no malformed records': explicit
    FAILFAST over clean landing data completes and matches the
    failfast_option expected post-state."""
    schema = _schema(f"{REF}/failfast_option/target_schema.json")
    loc = str(tmp_path / "out")
    FullLoad(
        spark,
        _full_load_params(loc, schema, f"{REF}/landing/new_data.psv", "FAILFAST"),
    ).run()
    got = spark.read.parquet(loc)
    expected = _read_psv(spark, f"{REF}/failfast_option/lake_data_post.psv", schema)
    assert _multiset_equal(got, expected)


def test_full_load_dropmalformed_golden(spark, tmp_path):
    """FullLoadTest 'DROPMALFORMED and malformed records are present':
    the load succeeds but drops the bad rows — strictly fewer rows than
    the clean expected post-state (the reference's own assertion)."""
    schema = _schema(f"{REF}/failfast_option/target_schema.json")
    loc = str(tmp_path / "out")
    FullLoad(
        spark,
        _full_load_params(
            loc, schema, f"{REF}/failfast_option/new_data_wrong.psv", "DROPMALFORMED"
        ),
    ).run()
    got = spark.read.parquet(loc)
    expected = _read_psv(spark, f"{REF}/failfast_option/lake_data_post.psv", schema)
    assert got.count() < expected.count()


def test_full_load_permissive_golden(spark, tmp_path):
    """FullLoadTest 'PERMISSIVE and malformed records are present':
    every row loads (same count as expected) but the malformed ones
    carry NULLed fields, so the multiset differs — both of the
    reference's assertions."""
    schema = _schema(f"{REF}/failfast_option/target_schema.json")
    loc = str(tmp_path / "out")
    FullLoad(
        spark,
        _full_load_params(
            loc, schema, f"{REF}/failfast_option/new_data_wrong.psv", "PERMISSIVE"
        ),
    ).run()
    got = spark.read.parquet(loc)
    expected = _read_psv(spark, f"{REF}/failfast_option/lake_data_post.psv", schema)
    assert got.count() == expected.count()
    assert not _multiset_equal(got, expected)


def _seed_partitioned_lake(spark, loc, schema):
    """Pre-load the partitioned fixture lake (lake_data_pre.psv) the way
    the reference's setupInitialState does."""
    full_schema = _schema(f"{REF}/partitioned/target_schema.json")
    df = _read_psv(spark, f"{REF}/partitioned/lake_data_pre.psv", full_schema)
    df.write.partitionBy("year", "month", "day").parquet(loc)
    return full_schema


def test_full_load_source_missing_preserves_lake_golden(spark, tmp_path):
    """FullLoadTest 'location that does not exist': the load fails on
    read and the pre-loaded lake still equals lake_data_pre.psv — the
    restore guarantee replayed against the reference's own fixture
    (FullLoadTest.scala:400-432, partitioned_not_exist_dir params)."""
    loc = str(tmp_path / "lake")
    full_schema = _seed_partitioned_lake(spark, loc, None)
    landing_schema = StructType(
        [f for f in full_schema.fields if f.name not in ("year", "month", "day")]
    )
    params = _full_load_params(
        loc, landing_schema, str(tmp_path / "data_not_exists"), partitioned=True
    )
    with pytest.raises(Exception):
        FullLoad(spark, params).run()
    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv(spark, f"{REF}/partitioned/lake_data_pre.psv", full_schema)
    assert _multiset_equal(got, expected)


def test_full_load_missing_partition_column_preserves_lake_golden(spark, tmp_path):
    """FullLoadTest 'partitioning column is missing': transform fails
    (the named partition_column isn't in the data) and the pre-loaded
    lake is untouched (FullLoadTest.scala:434-471)."""
    loc = str(tmp_path / "lake")
    full_schema = _seed_partitioned_lake(spark, loc, None)
    landing_schema = StructType(
        [f for f in full_schema.fields if f.name not in ("year", "month", "day")]
    )
    params = ParamsFile(
        {
            "source_dir": f"{REF}/landing/new_data.psv",
            "file_format": "dsv",
            "delimiter": "|",
            "has_header": False,
            "target_location": loc,
            "schema": landing_schema.jsonValue(),
            "target_partitions": ["year", "month", "day"],
            "partition_column": "date_missing_column",
            "partition_column_format": "yyyyMMdd",
        }
    )
    with pytest.raises(Exception):
        FullLoad(spark, params).run()
    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv(spark, f"{REF}/partitioned/lake_data_pre.psv", full_schema)
    assert _multiset_equal(got, expected)


# --- AppendLoadTest: reader-mode + date-column scenarios -----------------


def test_append_load_invalid_reader_mode_raises(spark, tmp_path):
    """AppendLoadTest 'reader_mode is set to an invalid string': the
    load aborts before writing anything."""
    with pytest.raises(Exception, match="[Ii]nvalid reader mode"):
        _run_append_golden(
            spark, tmp_path, "reader_mode_specification",
            ["wrong_data_20180422-00001.psv"],
            extra_params={"reader_mode": "invalid_mode", "has_header": True},
        )


def test_append_load_default_dropmalformed_golden(spark, tmp_path):
    """AppendLoadTest 'when reader mode is not set, DROPMALFORMED is
    used': the malformed landing rows silently drop, so the lake
    DIFFERS from the clean expected post-state (the reference asserts
    hasDiff == true) but the new partition landed."""
    got, expected = _run_append_golden(
        spark, tmp_path, "reader_mode_specification",
        ["wrong_data_20180422-00001.psv"],
        extra_params={"has_header": True},
    )
    assert not _multiset_equal(got, expected)
    assert got.count() < expected.count()
    assert (tmp_path / "lake/year=2018/month=4/day=22").exists()
    assert (tmp_path / "headers/year=2018/month=4/day=22/header.json").exists()


def test_append_load_permissive_golden(spark, tmp_path):
    """AppendLoadTest 'PERMISSIVE and there are malformed records':
    every row loads, the bad ones with NULLed fields — data is
    'incorrectly loaded' (hasDiff == true in the reference)."""
    got, expected = _run_append_golden(
        spark, tmp_path, "reader_mode_specification",
        ["wrong_data_20180422-00001.psv"],
        extra_params={"reader_mode": "PERMISSIVE", "has_header": True},
    )
    assert not _multiset_equal(got, expected)


def test_append_load_hierarchical_golden(spark, tmp_path):
    """AppendLoadTest hierarchical_load: landing files under a
    hive-style year=/month=/day= tree, one partition pre-seeded with a
    header whose only landing row is malformed (drops under the default
    DROPMALFORMED) — the other partition loads and the lake matches the
    expected post-state."""
    import shutil

    from m3d_engine_spark.operators.append_load import AppendLoad

    a = f"{FEAT}/loads/AppendLoadTestRes/hierarchical_load"
    with open(f"{a}/params.json") as fh:
        ref_params = json.load(fh)
    full_schema = _schema(f"{a}/target_schema.json")
    targets = ref_params["target_partitions"]

    loc = str(tmp_path / "lake")
    _read_psv(spark, f"{a}/lake_data_pre.psv", full_schema).write.partitionBy(
        *targets
    ).parquet(loc)

    landing = tmp_path / "landing"
    shutil.copytree(f"{a}/year=2018", landing / "year=2018")
    hdr = tmp_path / "headers" / "year=2018" / "month=1" / "day=1"
    hdr.mkdir(parents=True)
    shutil.copy(f"{a}/20180101_schema.json", hdr / "header.json")

    params = ParamsFile(
        {
            "source_dir": str(landing),
            "header_dir": str(tmp_path / "headers"),
            "file_format": "dsv",
            "delimiter": ref_params["delimiter"],
            "has_header": ref_params["has_header"],
            "regex_filename": ref_params["regex_filename"],
            "target_partitions": targets,
            "target_location": loc,
            "schema": full_schema.jsonValue(),
        }
    )
    AppendLoad(spark, params).run()

    got = spark.read.option("mergeSchema", "true").parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv(spark, f"{a}/lake_data_post.psv", full_schema)
    assert _multiset_equal(got, expected)
    assert (tmp_path / "headers/year=2018/month=1/day=1/header.json").exists()


def _date_columns_params(tmp_path, a, ref_params, full_schema, loc, landing):
    return ParamsFile(
        {
            "source_dir": str(landing),
            "header_dir": str(tmp_path / "headers"),
            "file_format": "dsv",
            "delimiter": ref_params["delimiter"],
            "has_header": ref_params["has_header"],
            "date_format": ref_params["date_format"],
            "partition_column": ref_params["partition_column"],
            "target_partitions": ref_params["target_partitions"],
            "target_location": loc,
            "schema": full_schema.jsonValue(),
        }
    )


def test_append_load_date_columns_golden(spark, tmp_path):
    """AppendLoadTest partitioned_and_date_columns: landing dates read
    with dateFormat MM/dd/yyyy, year/week partitions DERIVED from the
    date-typed report_date column (no partition_column_format in the
    params — the reference defaults to yyyy-MM-dd, AppendLoad.scala:50);
    weeks are the reference's ALIGNED weeks (05/18/2020 → week 20, not
    ISO 21)."""
    import shutil

    from m3d_engine_spark.operators.append_load import AppendLoad

    a = f"{FEAT}/loads/AppendLoadTestRes/partitioned_and_date_columns"
    with open(f"{a}/params.json") as fh:
        ref_params = json.load(fh)
    full_schema = _schema(f"{a}/target_schema.json")

    loc = str(tmp_path / "lake")
    _read_psv_dates(spark, f"{a}/lake_data_pre.psv", full_schema).write.partitionBy(
        *ref_params["target_partitions"]
    ).parquet(loc)
    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(f"{a}/new_data.psv", landing / "new_data.psv")

    AppendLoad(
        spark, _date_columns_params(tmp_path, a, ref_params, full_schema, loc, landing)
    ).run()

    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in full_schema.fields]
    )
    expected = _read_psv_dates(spark, f"{a}/lake_data_post.psv", full_schema)
    assert _multiset_equal(got, expected)
    assert (tmp_path / "lake/year=2020/week=20").exists()


def test_append_load_date_columns_invalid_dates_golden(spark, tmp_path):
    """AppendLoadTest partitioned_and_date_columns_exception: a 00/00/0000
    date row must not load. The reference's lenient 2.x parser accepted
    it and crashed in week derivation (SparkException); Spark 4's strict
    parser classifies the row malformed instead — under FAILFAST the
    load aborts (replayed here), under the DROPMALFORMED default the bad
    row drops and the three valid rows land (pinned too)."""
    import shutil

    from m3d_engine_spark.operators.append_load import AppendLoad

    a = f"{FEAT}/loads/AppendLoadTestRes/partitioned_and_date_columns_exception"
    with open(f"{a}/params.json") as fh:
        ref_params = json.load(fh)
    full_schema = _schema(f"{a}/target_schema.json")

    loc = str(tmp_path / "lake")
    _read_psv_dates(spark, f"{a}/lake_data_pre.psv", full_schema).write.partitionBy(
        *ref_params["target_partitions"]
    ).parquet(loc)
    pre_count = spark.read.parquet(loc).count()
    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(f"{a}/new_data.psv", landing / "new_data.psv")

    params = _date_columns_params(tmp_path, a, ref_params, full_schema, loc, landing)
    failfast = ParamsFile({**params.params, "reader_mode": "FAILFAST"})
    with pytest.raises(Exception):
        AppendLoad(spark, failfast).run()
    assert spark.read.parquet(loc).count() == pre_count

    AppendLoad(spark, params).run()
    assert spark.read.parquet(loc).count() == pre_count + 3


def _read_psv_dates(spark, path: str, schema: StructType):
    """Fixture PSVs whose date columns are MM/dd/yyyy formatted."""
    return (
        spark.read.schema(schema)
        .option("delimiter", "|")
        .option("dateFormat", "MM/dd/yyyy")
        .option("nullValue", "XXNULLXXX")
        .csv(path)
    )


# --- MaterializationTest: query-materialization scenarios ----------------

QM = f"{FEAT}/MaterializationTestRes/query_materialization"


def _run_query_mat(spark, tmp_path, with_initial=False, conflicting=False,
                   params_name="params.json", params_sub=""):
    """QueryMaterialization golden harness on the reference's
    select_conditions params: seed the mart (optionally with
    initial_data or a conflicting row in the selected partition), run,
    return (got, schema, target)."""
    from m3d_engine_spark.operators.materialization import QueryMaterialization

    with open(f"{QM}/{params_sub}{params_name}") as fh:
        ref_params = json.load(fh)
    schema = _schema(f"{QM}/schema.json")
    targets = ref_params["target_partitions"]
    _read_psv(spark, f"{QM}/source_data.psv", schema).createOrReplaceTempView(
        "golden_query_mat_source"
    )
    target = str(tmp_path / "mart")
    if with_initial:
        _read_psv(spark, f"{QM}/initial_data.psv", schema).write.partitionBy(
            *targets
        ).parquet(target)
    if conflicting:
        spark.createDataFrame(
            [(9999, 1111, "", 20170215, "CUSTOMER99", "ARTICLE", 99, 2017, 2, 15)],
            schema,
        ).write.mode("append").partitionBy(*targets).parquet(target)

    params = {
        "source_table": "golden_query_mat_source",
        "target_dir": target,
        "target_partitions": targets,
        "select_conditions": ref_params["select_conditions"],
    }
    if "number_output_partitions" in ref_params:
        params["number_output_partitions"] = ref_params["number_output_partitions"]
    QueryMaterialization(spark, ParamsFile(params)).run()

    got = spark.read.parquet(target).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    return got, schema, target


def test_query_materialization_fresh_golden(spark, tmp_path):
    """MaterializationTest 'same partition does not exist on the
    filesystem': the selected partition materializes into an empty
    target and equals expected_data.psv."""
    got, schema, target = _run_query_mat(spark, tmp_path)
    expected = _read_psv(spark, f"{QM}/expected_data.psv", schema)
    assert _multiset_equal(got, expected)
    assert os.path.isdir(f"{target}/year=2017/month=2/day=15")


def test_query_materialization_overwrites_same_partition_golden(spark, tmp_path):
    """MaterializationTest 'same partition exists on the filesystem': a
    conflicting pre-existing row in the SELECTED partition is replaced —
    the result equals expected_data.psv exactly."""
    got, schema, target = _run_query_mat(spark, tmp_path, conflicting=True)
    expected = _read_psv(spark, f"{QM}/expected_data.psv", schema)
    assert _multiset_equal(got, expected)
    assert os.path.isdir(f"{target}/year=2017/month=2/day=15")


def test_query_materialization_preserves_other_partitions_golden(spark, tmp_path):
    """MaterializationTest 'other partitions exist on the filesystem':
    partitions outside the select_conditions survive — result equals
    expected ∪ initial."""
    got, schema, target = _run_query_mat(spark, tmp_path, with_initial=True)
    expected = _read_psv(spark, f"{QM}/expected_data.psv", schema).unionByName(
        _read_psv(spark, f"{QM}/initial_data.psv", schema)
    )
    assert _multiset_equal(got, expected)
    for d in ("year=2017/month=2/day=15", "year=2017/month=3/day=15",
              "year=2017/month=6/day=15"):
        assert os.path.isdir(f"{target}/{d}")


def test_query_materialization_output_files_golden(spark, tmp_path):
    """MaterializationTest 'number of output partitions is 5': the
    reference's number_output_partitions spelling caps the selected
    partition at exactly 5 parquet files."""
    got, schema, target = _run_query_mat(
        spark, tmp_path, with_initial=True, params_sub="output_files_5/"
    )
    expected = _read_psv(spark, f"{QM}/expected_data.psv", schema).unionByName(
        _read_psv(spark, f"{QM}/initial_data.psv", schema)
    )
    assert _multiset_equal(got, expected)
    files = [
        f for f in os.listdir(f"{target}/year=2017/month=2/day=15")
        if f.endswith(".parquet")
    ]
    assert len(files) == 5, files


def test_full_materialization_partitioned_double_run_golden(spark, tmp_path):
    """MaterializationTest 'view is partitioned and there was a previous
    materialization': two consecutive partitioned materializations over
    a dir holding stray part files, pre-version partition dirs and old
    versions — retention keeps num_versions_to_retain-1 old versions
    plus the newest, the data matches, and the final version dir is the
    lexicographic max with year=2016/2017/2018 partitions inside."""
    import time

    from m3d_engine_spark.operators.materialization import FullMaterialization

    m = f"{FEAT}/MaterializationTestRes/full_materialization"
    with open(f"{m}/params.json") as fh:
        ref_params = json.load(fh)
    schema = _schema(f"{m}/schema.json")
    _read_psv(spark, f"{m}/source_data.psv", schema).createOrReplaceTempView(
        "golden_mat_full_part_source"
    )
    base = tmp_path / "data"
    base.mkdir()
    # createPreviousVersionsAndLeftovers (MaterializationTest.scala:471+):
    # 4 stray part files, 2 pre-version partition dirs, 4 old versions
    # (dirs + $folder$ markers) = 16 entries
    for f in ("part-0001.parquet", "part-0002.parquet",
              "part-0003.parquet", "part-0004.parquet"):
        (base / f).touch()
    for d in ("year=2019", "year=2020", "20200101_124514_UTC",
              "20200102_123012_UTC", "20200103_114329_UTC", "20200201_103210_UTC"):
        (base / d).mkdir()
        (base / d / "sample_file.parquet").touch()
        (base / f"{d}_$folder$").touch()
    assert len(list(base.iterdir())) == 16

    params = ParamsFile(
        {
            "source_table": "golden_mat_full_part_source",
            "target_dir": str(base),
            "target_partitions": ref_params["target_partitions"],
            "num_versions_to_retain": ref_params["num_versions_to_retain"],
        }
    )
    algo1 = FullMaterialization(spark, params)
    algo1.run()
    time.sleep(1.1)  # the reference waits 2 s for a distinct version stamp
    algo2 = FullMaterialization(spark, params)
    algo2.run()
    assert algo2.next_location != algo1.next_location

    got = spark.read.parquet(algo2.next_location).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
    expected = _read_psv(spark, f"{m}/expected_data.psv", schema)
    assert _multiset_equal(got, expected)

    for part_dir in ("year=2016", "year=2017", "year=2018"):
        assert os.path.isdir(f"{algo2.next_location}/{part_dir}")

    remaining = sorted(p.name for p in base.iterdir())
    v1 = algo1.next_location.rsplit("/", 1)[1]
    v2 = algo2.next_location.rsplit("/", 1)[1]
    # retention=3: after run 2 the newest + two previous survive; the
    # stray files, pre-version partition dirs and 2 oldest versions die
    assert remaining == sorted(
        ["20200103_114329_UTC", "20200103_114329_UTC_$folder$",
         "20200201_103210_UTC", "20200201_103210_UTC_$folder$", v1, v2]
    ), remaining
    assert max(remaining) == v2


def test_nested_flattener_partitioned_golden(spark, tmp_path):
    """NestedFlattenerTest scenario 2: same flatten/explode as scenario
    1 but written partitioned by device_brand — the registered algorithm
    runs end-to-end, the partition dirs exist and the data matches the
    reference's expected PSV."""
    from m3d_engine_spark.operators.nested_flattener import NestedFlattenerAlgorithm

    n = f"{FEAT}/NestedFlattenerTestRes"
    with open(f"{n}/scenario2/params.json") as fh:
        p = json.load(fh)
    tgt_schema = _schema(f"{n}/target_schema.json")
    loc = str(tmp_path / "out")
    params = ParamsFile(
        {
            "source_location": f"{n}/nest_test/data",
            "target_location": loc,
            "target_partitions": p["target_partitions"],
            "chars_to_replace": p["chars_to_replace"],
            "replacement_char": p["replacement_char"],
            "fields_to_flatten": p["fields_to_flatten"],
            "column_mapping": p["column_mapping"],
        }
    )
    NestedFlattenerAlgorithm(spark, params).run()
    got = spark.read.parquet(loc).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in tgt_schema.fields]
    )
    expected = _read_psv(spark, f"{n}/expected_target_data.psv", tgt_schema)
    assert _multiset_equal(got, expected)
    brands = {d for d in os.listdir(loc) if d.startswith("device_brand=")}
    assert brands, os.listdir(loc)


def test_gzip_decompressor_uncompressed_present_raises(spark, tmp_path):
    """GzipDecompressorTest 'exception if uncompressed files are already
    present': a file no codec claims fails the whole job (half-finished
    previous run detection)."""
    import shutil

    from m3d_engine_spark.operators.gzip_decompressor import (
        decompress_directory_hadoop,
    )

    g = f"{FEAT}/GzipDecompressorTestRes"
    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(f"{g}/data_20180719111849_data_1-3.gz", landing)
    shutil.copy(f"{g}/data_20180719111849_data_1-3", landing)  # uncompressed
    with pytest.raises(Exception, match="No codec found for file"):
        decompress_directory_hadoop(spark, f"file://{landing}")


def test_gzip_decompressor_missing_directory_raises(spark, tmp_path):
    """GzipDecompressorTest 'exception if directory does not exist'."""
    from m3d_engine_spark.operators.gzip_decompressor import (
        decompress_directory_hadoop,
    )

    with pytest.raises(Exception, match="does not exist"):
        decompress_directory_hadoop(spark, f"file://{tmp_path}/nope")
