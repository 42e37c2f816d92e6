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
