"""Condensation + in-memory merge semantics (DeltaLoad parity).

Scenario shapes from the reference's DeltaLoadTest.scala: multiple
changes per business key (latest by technical key wins), delete record
modes R/D/X, upsert modes null/''/'N', new keys inserted."""

from pyspark.sql import Row

from m3d_engine_spark.operators.delta_load import condense, merge_delta
from tests.conftest import multiset_equal


def _active(spark):
    return spark.createDataFrame(
        [
            Row(salesorder=1, item=1, amount=100),
            Row(salesorder=1, item=2, amount=110),
            Row(salesorder=2, item=1, amount=200),
        ]
    )


def _delta(spark):
    # (salesorder, item) business key; ts technical key; recordmode marker
    return spark.createDataFrame(
        [
            Row(ts=1, salesorder=1, item=1, amount=101, recordmode="N"),
            Row(ts=2, salesorder=1, item=1, amount=102, recordmode=""),   # latest change wins
            Row(ts=1, salesorder=1, item=2, amount=999, recordmode="D"),  # delete
            Row(ts=1, salesorder=3, item=1, amount=300, recordmode=None), # new key
        ]
    )


def test_condense_keeps_latest_per_key(spark):
    out = condense(_delta(spark), ["salesorder", "item"], ["ts"])
    rows = {(r.salesorder, r.item): (r.ts, r.amount) for r in out.collect()}
    assert rows[(1, 1)] == (2, 102)
    assert len(rows) == 3


def test_condense_init_load_orders_recordmode(spark):
    from pyspark.sql import Row as R

    delta = spark.createDataFrame(
        [R(ts=1, k=1, recordmode="N"), R(ts=1, k=1, recordmode="D")]
    )
    out = condense(delta, ["k"], ["ts"], record_mode_column="recordmode", init_load=True)
    # tie on ts → recordmode ASC → 'D' sorts before 'N'
    assert out.collect()[0].recordmode == "D"


def test_merge_applies_upserts_and_deletes(spark):
    active = _active(spark)
    condensed = condense(_delta(spark), ["salesorder", "item"], ["ts"])
    merged = merge_delta(active, condensed, ["salesorder", "item"])
    expected = spark.createDataFrame(
        [
            Row(salesorder=1, item=1, amount=102),  # updated (latest delta)
            Row(salesorder=2, item=1, amount=200),  # untouched survivor
            Row(salesorder=3, item=1, amount=300),  # inserted (null recordmode)
            # (1,2) deleted
        ]
    )
    assert merged.columns == active.columns
    assert multiset_equal(merged, expected)


def test_merge_pads_missing_columns(spark):
    from pyspark.sql import Row as R

    active = spark.createDataFrame([R(k=1, a=1, b="x")])
    delta = spark.createDataFrame([R(ts=1, k=2, a=2, recordmode="N")])  # no b
    condensed = condense(delta, ["k"], ["ts"])
    merged = merge_delta(active, condensed, ["k"])
    rows = {r.k: (r.a, r.b) for r in merged.collect()}
    assert rows[1] == (1, "x")
    assert rows[2] == (2, None)
