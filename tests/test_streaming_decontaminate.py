"""Streaming twin of the artifact-mode Decontaminate scrub:
streaming==batch bit-exact over multiple micro-batches, at-least-once
replay idempotency, and the sidecar contract failing at WIRING time
(not the Nth batch)."""

import pytest

from pyspark.sql import functions as F

from m3d_engine_spark.config import ConfigError
from m3d_engine_spark.operators.suffix import (
    decontaminate_with_artifact,
    probe_gram_artifact,
)
from m3d_engine_spark.streaming.pipeline import (
    decontaminate_stream_batch,
    streaming_decontaminate,
)

BENCH = "m n o p q r s t"
SCHEMA = "doc_id int, text string"


def _artifact(spark, tmp_path, span_tokens=8):
    probes = spark.createDataFrame([(9, BENCH)], SCHEMA)
    loc = str(tmp_path / "artifact")
    probe_gram_artifact(probes, "text", span_tokens=span_tokens).write.parquet(
        loc
    )
    import json

    (tmp_path / "artifact" / "_meta.json").write_text(
        json.dumps({"kind": "probe_gram_artifact", "span_tokens": span_tokens})
    )
    return loc


@pytest.mark.slow
def test_streaming_scrub_equals_batch_scrub(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "scrubbed")
    ckpt = str(tmp_path / "ckpt")
    art = _artifact(spark, tmp_path)

    b1 = [(1, f"pre {BENCH} post"), (2, "clean document one here")]
    b2 = [(3, f"{BENCH} leading words"), (4, "another clean body")]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(landing)
        q = streaming_decontaminate(stream, art, out, ckpt)
        assert q.awaitTermination(180), "availableNow run must terminate"

    run()
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    run()  # checkpoint resume: only the new file is processed

    got = sorted(
        spark.read.parquet(out).drop("batch_id").collect()
    )
    want = sorted(
        decontaminate_with_artifact(
            spark.createDataFrame(b1 + b2, SCHEMA), "doc_id", "text",
            spark.read.parquet(art), span_tokens=8,
        ).collect()
    )
    assert got == want
    by_id = {r.doc_id: r for r in got}
    assert by_id[1].n_removed == 8 and by_id[3].n_removed == 8
    assert by_id[2].n_removed == 0 and by_id[4].n_removed == 0


@pytest.mark.slow
def test_streaming_scrub_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a batch body with the
    same batch_id must overwrite its own partition, not append a
    second copy."""
    out = str(tmp_path / "scrubbed")
    art = _artifact(spark, tmp_path)
    batch = spark.createDataFrame(
        [(1, f"pre {BENCH} post"), (2, "clean text")], SCHEMA
    )
    for _ in range(2):  # original run + replay
        decontaminate_stream_batch(
            batch, 7, art, out, "doc_id", "text", 8
        )
    rows = spark.read.parquet(out).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2]  # no duplicates
    assert {r.batch_id for r in rows} == {7}


def test_streaming_scrub_sidecar_contract_fails_at_wiring(spark, tmp_path):
    """A meta-less artifact with no explicit span_tokens must fail when
    the query is WIRED, before any batch runs; a conflicting explicit
    value likewise."""
    probes = spark.createDataFrame([(9, BENCH)], SCHEMA)
    bare = str(tmp_path / "bare_artifact")
    probe_gram_artifact(probes, "text", span_tokens=8).write.parquet(bare)
    landing = str(tmp_path / "landing")
    spark.createDataFrame([(1, "x y z")], SCHEMA).write.parquet(landing)
    stream = spark.readStream.schema(SCHEMA).parquet(landing)
    with pytest.raises(ConfigError, match="_meta.json"):
        streaming_decontaminate(
            stream, bare, str(tmp_path / "o"), str(tmp_path / "c")
        )
    art = _artifact(spark, tmp_path, span_tokens=8)
    with pytest.raises(ConfigError, match="baked-in"):
        streaming_decontaminate(
            stream, art, str(tmp_path / "o2"), str(tmp_path / "c2"),
            span_tokens=5,
        )


def test_mid_stream_artifact_refresh_at_different_L_fails_batch(
    spark, tmp_path
):
    """A mid-stream artifact refresh is only sound at the SAME
    span_tokens: the batch body re-validates the sidecar and a refresh
    at a different L fails the batch loudly — never hashes with the
    stale L and silently matches nothing."""
    import json

    art = _artifact(spark, tmp_path, span_tokens=8)
    batch = spark.createDataFrame([(1, f"pre {BENCH} post")], SCHEMA)
    out = str(tmp_path / "out")
    decontaminate_stream_batch(batch, 0, art, out, "doc_id", "text", 8)
    # benchmark re-released at L=5; sidecar updated accordingly
    (tmp_path / "artifact" / "_meta.json").write_text(
        json.dumps({"kind": "probe_gram_artifact", "span_tokens": 5})
    )
    with pytest.raises(ConfigError, match="baked-in"):
        decontaminate_stream_batch(batch, 1, art, out, "doc_id", "text", 8)


def test_corrupt_sidecar_and_bool_dial_classify_as_config_errors(
    spark, tmp_path
):
    import json

    from m3d_engine_spark.operators.suffix import (
        resolve_artifact_span_tokens,
    )

    art = _artifact(spark, tmp_path, span_tokens=8)
    # truncated sidecar: present but no usable span_tokens
    (tmp_path / "artifact" / "_meta.json").write_text(
        json.dumps({"kind": "probe_gram_artifact"})
    )
    with pytest.raises(ConfigError, match="no usable span_tokens"):
        resolve_artifact_span_tokens(spark, art)
    # the {"span_tokens": true} coercion guard on the direct surface
    with pytest.raises(ConfigError, match="boolean"):
        resolve_artifact_span_tokens(spark, art, explicit=True)


@pytest.mark.slow
def test_sidecar_disappearing_mid_stream_fails_batch(spark, tmp_path):
    """An artifact wired WITH a sidecar that is later refreshed
    WITHOUT one must fail the next batch loudly — its L is unknowable
    and the stale wiring L would silently scrub nothing. A meta-less
    artifact stays quiet per batch (the trust warning was paid at
    wiring), which is the r14 noise fix this guard must not undo."""
    import os

    from m3d_engine_spark.streaming.pipeline import (
        decontaminate_stream_batch,
    )

    art = _artifact(spark, tmp_path)
    batch = spark.createDataFrame([(1, f"pre {BENCH} post")], SCHEMA)
    out = str(tmp_path / "out")
    # wired with sidecar -> expect_sidecar=True; batch 0 fine
    decontaminate_stream_batch(
        batch, 0, art, out, "doc_id", "text", 8, expect_sidecar=True
    )
    os.remove(f"{art}/_meta.json")  # refresh lost the sidecar
    with pytest.raises(ConfigError, match="gone"):
        decontaminate_stream_batch(
            batch, 1, art, out, "doc_id", "text", 8, expect_sidecar=True
        )
    # meta-less from the start: quiet and functional
    decontaminate_stream_batch(
        batch, 2, art, out, "doc_id", "text", 8, expect_sidecar=False
    )
    row = spark.read.parquet(f"{out}/batch_id=2").collect()[0]
    assert row.n_removed == 8
