"""Date-component derivation parity tests.

Modeled on the reference's DateComponentDerivationTest.scala (exact
year/month/day/week values for yyyyMMdd/yyyyMM/yyyyww/yyyywwe + bad-date
sentinels 9999/99)."""

from pyspark.sql import functions as F

from m3d_engine_spark.functions.dates import date_component_columns, with_date_components


def _derive(spark, value, fmt, targets):
    df = spark.createDataFrame([(value,)], "s string")
    row = df.withColumns(date_component_columns(F.col("s"), fmt, targets)).collect()[0]
    return tuple(row[t] for t in targets)


def test_yyyymmdd_components(spark):
    assert _derive(spark, "20160601", "yyyyMMdd", ["year", "month", "day"]) == (2016, 6, 1)
    assert _derive(spark, "20161231", "yyyyMMdd", ["year", "month", "day"]) == (2016, 12, 31)


def test_aligned_week_not_iso(spark):
    # 2016-01-01 is ISO week 53 of 2015; aligned week must be 1.
    assert _derive(spark, "20160101", "yyyyMMdd", ["year", "week"]) == (2016, 1)
    # Jan 8 starts aligned week 2.
    assert _derive(spark, "20160108", "yyyyMMdd", ["week"]) == (2,)
    # Dec 31 of a leap year: dayofyear=366 → week 53.
    assert _derive(spark, "20161231", "yyyyMMdd", ["week"]) == (53,)


def test_bad_dates_map_to_sentinels(spark):
    for bad in ["20161301", "20160230", "999", "abcdefgh", None]:
        assert _derive(spark, bad, "yyyyMMdd", ["year", "month", "day", "week"]) == (
            9999, 99, 99, 99,
        )


def test_yyyymm_format(spark):
    assert _derive(spark, "201606", "yyyyMM", ["year", "month"]) == (2016, 6)
    # day is not expressible by the format → sentinel
    assert _derive(spark, "201606", "yyyyMM", ["day"]) == (99,)


def test_week_formats(spark):
    assert _derive(spark, "201652", "yyyyww", ["year", "week"]) == (2016, 52)
    assert _derive(spark, "2016521", "yyyywwe", ["year", "week"]) == (2016, 52)
    assert _derive(spark, "201699", "yyyyww", ["year", "week"]) == (9999, 99)
    assert _derive(spark, "2016", "yyyyww", ["year", "week"]) == (9999, 99)


def test_with_date_components_dataframe(spark):
    df = spark.createDataFrame([(20160601,), (99999999,)], "date int")
    out = with_date_components(df, "date", "yyyyMMdd", ["year", "month", "day"])
    rows = {r["date"]: (r["year"], r["month"], r["day"]) for r in out.collect()}
    assert rows[20160601] == (2016, 6, 1)
    assert rows[99999999] == (9999, 99, 99)
