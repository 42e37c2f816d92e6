"""Schema contract for the driver-generated testdata (TESTDATA.md).

The driver regenerates /root/testdata between rounds and has already
changed the physical encoding of ``events.ts`` once (TIMESTAMP(NANOS)
→ tz-naive timestamp[us], 2026-08-13), which broke three operators
mid-plan (VERDICT r4 "What's wrong" #1). These tests pin the
ENGINE-VISIBLE dtypes — i.e. what ``load_table`` hands to every
operator after normalization — for all ten tables, so the next
encoding change fails here, in one obvious place, instead of as an
AnalysisException three plans deep.

Also pins the type-agnosticism that makes the engine robust to the
encoding: sessionize over the same logical events encoded as
TIMESTAMP, TIMESTAMP_NTZ, and epoch-ns BIGINT must be identical.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from m3d_engine_spark.functions.epoch import epoch_us_of
from m3d_engine_spark.sources.testdata import TABLES, load_table

# What every operator/entry assumes about the loaded tables. Names are
# exact and ordered; dtypes are simpleString form. events.ts MUST come
# out of load_table as a true tz-aware TIMESTAMP whatever the file has.
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"),
               ("n_regionkey", "int")],
    "customer": [("c_custkey", "bigint"), ("c_name", "string"),
                 ("c_nationkey", "int"), ("c_acctbal", "double"),
                 ("c_mktsegment", "string")],
    "supplier": [("s_suppkey", "bigint"), ("s_name", "string"),
                 ("s_nationkey", "int"), ("s_acctbal", "double")],
    "part": [("p_partkey", "bigint"), ("p_name", "string"),
             ("p_brand", "string"), ("p_type", "string"),
             ("p_size", "int"), ("p_retailprice", "double")],
    # o_orderdate / l_shipdate read as TIMESTAMP_NTZ since the
    # 2026-08-13 regeneration (tz-naive timestamp[us] in the files);
    # the date-typed entries CAST them and stayed green, so the
    # contract pins NTZ deliberately rather than normalizing.
    "orders": [("o_orderkey", "bigint"), ("o_custkey", "bigint"),
               ("o_orderstatus", "string"), ("o_totalprice", "double"),
               ("o_orderdate", "timestamp_ntz"),
               ("o_orderpriority", "string")],
    "lineitem": [("l_orderkey", "bigint"), ("l_partkey", "bigint"),
                 ("l_suppkey", "bigint"), ("l_linenumber", "int"),
                 ("l_quantity", "double"), ("l_extendedprice", "double"),
                 ("l_discount", "double"), ("l_tax", "double"),
                 ("l_returnflag", "string"), ("l_linestatus", "string"),
                 ("l_shipdate", "timestamp_ntz")],
    "events": [("event_id", "bigint"), ("ts", "timestamp"),
               ("user_id", "bigint"), ("event_type", "string"),
               ("value", "double"), ("props", "string")],
    "documents": [("doc_id", "bigint"), ("text", "string"),
                  ("lang", "string"), ("source", "string"),
                  ("n_chars", "bigint")],
    "embeddings": [("vec_id", "bigint"), ("embedding", "array<float>"),
                   ("label", "int")],
}


@pytest.mark.parametrize("table", TABLES)
def test_engine_visible_schema(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    assert got == EXPECTED[table], (
        f"{table}: engine-visible schema changed — a testdata "
        f"regeneration altered the file encoding. Fix "
        f"sources/testdata.py normalization, then update this contract."
        f"\n got: {got}\n want: {EXPECTED[table]}"
    )


def _sessionize_rows(spark, events_df):
    from m3d_engine_spark.streaming.pipeline import sessionize

    out = sessionize(events_df, gap="30 minutes")
    return sorted(
        out.select(
            "user_id",
            epoch_us_of(out, "session_start").alias("start_us"),
            epoch_us_of(out, "session_end").alias("end_us"),
            F.col("n_events").cast("int"),
            "sum_value",
        ).collect()
    )


def test_sessionize_identical_across_ts_encodings(spark):
    """The same logical events encoded three ways must sessionize
    identically: tz-aware TIMESTAMP (canonical), TIMESTAMP_NTZ (what
    the 2026-08-13 testdata carries), epoch-ns BIGINT (the legacy
    nanosAsLong read)."""
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for uid in (1, 2):
        offs = [0, 60, 2400, 2500, 9999]  # three sessions per user
        for i, off in enumerate(offs):
            rows.append((uid, base + datetime.timedelta(seconds=off + uid),
                         float(i)))

    ts_df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]),
    )
    ntz_df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("value", T.DoubleType()),
        ]),
    )
    epoch = datetime.datetime(1970, 1, 1)
    long_df = spark.createDataFrame(
        [(u, int((t - epoch).total_seconds() * 1_000_000) * 1000, v)
         for u, t, v in rows],
        T.StructType([
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]),
    )

    r_ts = _sessionize_rows(spark, ts_df)
    r_ntz = _sessionize_rows(spark, ntz_df)
    r_long = _sessionize_rows(spark, long_df)
    assert len(r_ts) == 6  # 2 users × 3 sessions
    assert r_ts == r_ntz == r_long
