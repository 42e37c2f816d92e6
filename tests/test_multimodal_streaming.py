"""Multimodal binary plumbing + streaming pipelines."""

import pytest
from pyspark.sql import functions as F

from m3d_engine_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    payload_metadata,
    synthesize_media_from_documents,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    return synthesize_media_from_documents(docs)


def test_payload_metadata_jvm_side(media):
    out = payload_metadata(media)
    r = out.filter(F.col("media_id") == out.select(F.min("media_id")).first()[0]).first()
    assert r.byte_len > 0
    assert len(r.md5) == 32 and len(r.sha256) == 64


def test_decode_media_stub_batch_shape(media):
    out = decode_media(media, decode_stub=True)
    assert out.schema == DECODED_SCHEMA
    rows = out.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert 16 <= r.width < 256 and 16 <= r.height < 256
        assert len(r.sha256) == 64


def test_decode_media_real_raises(media):
    from m3d_engine_spark.operators.multimodal import _decode_batch_real
    import pandas as pd

    with pytest.raises(NotImplementedError):
        _decode_batch_real(pd.DataFrame({"payload": [b"x"]}))


def test_streaming_append_load_availablenow(spark, tmp_path, sf_dir):
    from m3d_engine_spark.streaming.pipeline import streaming_append_load

    src = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(200)
    landing = str(tmp_path / "landing")
    src.withColumn(
        "date_str", F.date_format("o_orderdate", "yyyyMMdd")
    ).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    q = streaming_append_load(
        spark,
        landing,
        schema,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        partition_column="date_str",
        partition_format="yyyyMMdd",
        target_partitions=["year", "month"],
    ).start()
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 200
    assert {"year", "month"} <= set(out.columns)
    years = {r.year for r in out.select("year").distinct().collect()}
    assert years <= set(range(1995, 2002))


def test_windowed_rollup_batch_semantics(spark, sf_dir):
    from m3d_engine_spark.streaming.pipeline import windowed_rollup

    from m3d_engine_spark.sources.testdata import load_table
    events = load_table(spark, sf_dir, "events")
    out = windowed_rollup(events, window="1 day", watermark="2 days")
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == events.count()
