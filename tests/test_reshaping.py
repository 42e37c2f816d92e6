"""Transpose, FixedSizeStringExtractor, NestedFlattener transforms."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from m3d_engine_spark.operators.fixed_size_extractor import FixedField, extract_fixed_width
from m3d_engine_spark.operators.nested_flattener import flatten, flatten_structs
from m3d_engine_spark.operators.transpose import transpose


def test_transpose_long_to_wide(spark):
    df = spark.createDataFrame(
        [
            Row(id="1", name="product", value="nokia"),
            Row(id="1", name="level", value="1.0"),
            Row(id="2", name="product", value="moto"),
            Row(id="2", name=None, value="ignored"),
        ]
    )
    out = transpose(df, ["id"], "name", "value", pivot_values=["product", "level"])
    rows = {r.id: (r.product, r.level) for r in out.collect()}
    assert rows["1"] == ("nokia", "1.0")
    assert rows["2"] == ("moto", None)


def test_fixed_width_extraction(spark):
    #          1-3  5-8   10-12
    line = "abc 1234 x  "
    df = spark.createDataFrame([Row(value=line), Row(value="      42    ")])
    fields = [
        FixedField("name", 1, 3, "string"),
        FixedField("num", 5, 8, "int"),
        FixedField("tag", 10, 12, "string"),
    ]
    out = extract_fixed_width(df, "value", fields)
    rows = out.collect()
    assert (rows[0].name, rows[0].num, rows[0].tag) == ("abc", 1234, "x")
    # blank fields → NULL, digits parse from padded field
    assert (rows[1].name, rows[1].num, rows[1].tag) == (None, 42, None)


def test_flatten_structs_and_cleansing(spark):
    df = spark.createDataFrame(
        [Row(id=1, info=Row(**{"a.b": "v1", "c:d": Row(e=2)}))]
    )
    out = flatten_structs(df)
    assert set(out.columns) == {"id", "info__a_b", "info__c_d__e"}
    r = out.collect()[0]
    assert r["info__a_b"] == "v1" and r["info__c_d__e"] == 2


def test_flatten_with_explode_and_mapping(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, events=[Row(t="click", v=1), Row(t="view", v=2)]),
            Row(id=2, events=[]),
        ]
    )
    out = flatten(
        df,
        explode_columns=["events"],
        column_mapping={"id": "batch_id", "events__t": "event_type", "events__v": "event_value"},
    )
    assert out.columns == ["batch_id", "event_type", "event_value"]
    rows = sorted(out.collect(), key=lambda r: (r.batch_id, r.event_value or 0))
    assert (rows[0].batch_id, rows[0].event_type, rows[0].event_value) == (1, "click", 1)
    # explode_outer keeps the empty-array row with NULLs
    assert (rows[2].batch_id, rows[2].event_type) == (2, None)


def test_side_flatten(spark):
    from m3d_engine_spark.operators.nested_flattener import side_flatten

    df = spark.createDataFrame([Row(id=1, arr=["a", "b"])])
    out = side_flatten(df, "arr", 3)
    r = out.collect()[0]
    assert (r["arr_0"], r["arr_1"], r["arr_2"]) == ("a", "b", None)


# ---------------------------------------------------------------------------
# Round 2: reference-parity flat_dataframe + NestedFlattener algorithm +
# in-load reshaping (FullLoadTest's flatten+transpose-in-load scenario,
# params_transpose_scenario.json shape).
# ---------------------------------------------------------------------------
import json

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators import full_load as _full_load  # noqa: F401 — populate REGISTRY
from m3d_engine_spark.operators.base import REGISTRY
from m3d_engine_spark.operators.nested_flattener import flat_dataframe

_NESTED_ROWS = [
    {
        "partition": {"key": ["p1"], "position": 7},
        "rows": [
            {
                "cells": [
                    {"name": "colA", "value": "1"},
                    {"name": "colB", "value": "2"},
                ],
                "clustering": ["a1", "f1"],
                "type": "row",
            }
        ],
        "junk": {"drop": "me"},
    }
]

_NESTED_SCHEMA = (
    "partition struct<key: array<string>, position: bigint>, "
    "rows array<struct<cells: array<struct<name: string, value: string>>, "
    "clustering: array<string>, type: string>>, "
    "junk struct<drop: string>"
)

_FLATTEN_CONF = dict(
    fields_to_flatten=["partition", "partition__key", "rows", "rows__cells"],
    column_mapping={
        "partition__key": "product",
        "articleNo": "articleNo",
        "FactoryID": "FactoryID",
        "rows__cells__name": "name",
        "rows__cells__value": "value",
    },
    side_flatten={"rows__clustering": ["articleNo__0", "FactoryID__1"]},
)


def _nested_df(spark):
    return spark.createDataFrame(
        [json.dumps(r) for r in _NESTED_ROWS],  # via json to keep struct order
        "string",
    ).selectExpr(f"from_json(value, '{_NESTED_SCHEMA}') AS j").select("j.*")


def test_flat_dataframe_reference_scenario(spark):
    out = flat_dataframe(_nested_df(spark), **_FLATTEN_CONF)
    # column ORDER follows the surviving columns' order, as in the
    # reference (NestedFlattener.scala:207-213), not the mapping order
    assert set(out.columns) == {"product", "articleNo", "FactoryID", "name", "value"}
    rows = {tuple(r.asDict()[c] for c in ["product", "articleNo", "FactoryID", "name", "value"]) for r in out.collect()}
    assert rows == {
        ("p1", "a1", "f1", "colA", "1"),
        ("p1", "a1", "f1", "colB", "2"),
    }


def test_nested_flattener_algorithm_registered(spark, tmp_path):
    src = str(tmp_path / "nested_src")
    _nested_df(spark)._jdf  # noqa: B018 — force analysis before write
    _nested_df(spark).write.parquet(src)
    out_loc = str(tmp_path / "flat_out")
    params = ParamsFile(
        {
            "source_location": src,
            "target_location": out_loc,
            **{k: v for k, v in _FLATTEN_CONF.items()},
        }
    )
    REGISTRY["NestedFlattener"](spark, params).run()
    got = spark.read.parquet(out_loc)
    rows = {tuple(r.asDict()[c] for c in ["product", "articleNo", "FactoryID", "name", "value"]) for r in got.collect()}
    assert rows == {
        ("p1", "a1", "f1", "colA", "1"),
        ("p1", "a1", "f1", "colB", "2"),
    }


def test_full_load_with_reshaping_chain(spark, tmp_path):
    """FullLoad with additional_task: flatten → transpose → enforce —
    the FullLoadTest nested-flatten+transpose-in-load scenario."""
    src = str(tmp_path / "land")
    _nested_df(spark).write.parquet(src)
    spark.sql("DROP TABLE IF EXISTS reshaped_t")
    spark.sql(
        "CREATE TABLE reshaped_t (product string, articleNo string, "
        "FactoryID string, colA string, colB string) USING PARQUET "
        f"LOCATION '{tmp_path / 'reshaped_loc' / 'v0'}'"
    )
    params = ParamsFile(
        {
            "source_dir": src,
            "file_format": "parquet",
            "target_table": "reshaped_t",
            "additional_task": {
                "nested_task_properties": {
                    "fields_to_flatten": _FLATTEN_CONF["fields_to_flatten"],
                    "column_mapping": _FLATTEN_CONF["column_mapping"],
                    "side_flatten": _FLATTEN_CONF["side_flatten"],
                },
                "transpose_task_properties": {
                    "pivot_column": "name",
                    "aggregation_column": "value",
                    "group_by_column": ["product", "articleNo", "FactoryID"],
                },
                "enforce_schema": True,
            },
        }
    )
    REGISTRY["FullLoad"](spark, params).run()
    rows = {tuple(r) for r in spark.table("reshaped_t").collect()}
    assert rows == {("p1", "a1", "f1", "1", "2")}
    spark.sql("DROP TABLE IF EXISTS reshaped_t")
