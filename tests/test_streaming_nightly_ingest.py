"""Streaming twin of examples/nightly_ingest.json (dedup → scrub in
ONE foreachBatch): streaming == the two-step batch Pipeline bit-exact
over two nights, and at-least-once replay idempotency for the composed
batch body."""

import json

import pytest

from pyspark.sql import functions as F

import m3d_engine_spark.operators.chain  # noqa: F401 — Pipeline registry
import m3d_engine_spark.operators.incremental  # noqa: F401
import m3d_engine_spark.operators.suffix  # noqa: F401
from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.base import REGISTRY
from m3d_engine_spark.operators.incremental import (
    materialize_dedup_artifacts,
)
from m3d_engine_spark.operators.suffix import probe_gram_artifact
from m3d_engine_spark.streaming.pipeline import (
    nightly_ingest_stream_batch,
    seed_accepted_corpus,
    streaming_nightly_ingest,
)

BENCH = "m n o p q r s t"
SCHEMA = "doc_id int, text string"
SEED_TEXT = "seed corpus doc body that is already in the lake tonight"


def _artifact(spark, tmp_path, span_tokens=8):
    probes = spark.createDataFrame([(9, BENCH)], SCHEMA)
    loc = str(tmp_path / "artifact")
    probe_gram_artifact(probes, "text", span_tokens=span_tokens).write.parquet(
        loc
    )
    (tmp_path / "artifact" / "_meta.json").write_text(
        json.dumps({"kind": "probe_gram_artifact", "span_tokens": span_tokens})
    )
    return loc


NIGHT1 = [
    (10, SEED_TEXT),                                   # exact dup of the seed
    (11, f"fresh doc with {BENCH} contamination body"),
    (12, "fresh clean doc with nothing shared at all tonight"),
]
NIGHT2 = [
    (12, "fresh clean doc with nothing shared at all tonight"),  # re-landed
    (20, f"night two arrival {BENCH} trailing words"),
    (21, "an entirely new document for night number two"),
]


@pytest.mark.slow
def test_streaming_nightly_ingest_equals_batch_pipeline(spark, tmp_path):
    """Two nights through the streaming twin == the same two nights
    through the batch Pipeline (IncrementalDedup(batch) →
    Decontaminate(artifact mode)), with the batch side's dedup
    artifacts re-materialized from the corpus state each night — the
    nightly edition of the example's weekly re-materialize, so both
    sides dedup against identical corpus states."""
    art = _artifact(spark, tmp_path)
    seed = spark.createDataFrame([(1, SEED_TEXT)], SCHEMA)

    # ---- streaming twin
    landing = str(tmp_path / "landing")
    accepted = str(tmp_path / "accepted")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    seed_accepted_corpus(seed, accepted)

    def run_stream():
        stream = spark.readStream.schema(SCHEMA).parquet(landing)
        q = streaming_nightly_ingest(
            stream, accepted, art, out, ckpt, threshold=0.5
        )
        assert q.awaitTermination(180), "availableNow run must terminate"

    for rows in (NIGHT1, NIGHT2):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        run_stream()
    got = sorted(spark.read.parquet(out).drop("batch_id").collect())

    # ---- batch Pipeline, same nights
    corpus = seed
    want_rows = []
    for tag, rows in (("n1", NIGHT1), ("n2", NIGHT2)):
        arts = str(tmp_path / f"arts_{tag}")
        materialize_dedup_artifacts(corpus, "doc_id", "text", arts)
        incoming = str(tmp_path / f"incoming_{tag}")
        staged = str(tmp_path / f"staged_{tag}")
        clean = str(tmp_path / f"clean_{tag}")
        spark.createDataFrame(rows, SCHEMA).write.parquet(incoming)
        REGISTRY["Pipeline"](spark, ParamsFile({
            "report_location": str(tmp_path / f"report_{tag}"),
            "steps": [
                {"algorithm": "IncrementalDedup", "params": {
                    "action": "batch",
                    "source_location": incoming,
                    "artifact_location": arts,
                    "threshold": 0.5,
                    "target_location": staged,
                }},
                {"algorithm": "Decontaminate", "params": {
                    "source_location": staged,
                    "probe_artifact_location": art,
                    "target_location": clean,
                }},
            ],
        })).run()
        # the accepted corpus grows by the night's dedup survivors
        # (pre-scrub text — the same thing the streaming twin commits)
        corpus = corpus.unionByName(spark.read.parquet(staged))
        want_rows.extend(spark.read.parquet(clean).collect())

    assert got == sorted(want_rows)
    by_id = {r.doc_id: r for r in got}
    # doc 10 (seed dup) and the re-landed 12 never reached the scrub
    assert set(by_id) == {11, 12, 20, 21}
    assert by_id[11].n_removed == 8 and by_id[20].n_removed == 8
    assert by_id[12].n_removed == 0 and by_id[21].n_removed == 0


@pytest.mark.slow
def test_nightly_ingest_stream_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying the composed batch body
    with the same batch_id rewrites BOTH its corpus partition and its
    output partition — no duplicated survivors, no duplicated output,
    and the pair stays consistent."""
    art = _artifact(spark, tmp_path)
    accepted = str(tmp_path / "accepted")
    out = str(tmp_path / "out")
    seed_accepted_corpus(
        spark.createDataFrame([(1, SEED_TEXT)], SCHEMA), accepted
    )
    batch = spark.createDataFrame(NIGHT1, SCHEMA)
    for _ in range(2):  # original + replay
        nightly_ingest_stream_batch(
            batch, 0, accepted, art, out, "doc_id", "text", 8,
            threshold=0.5,
        )
    surv = spark.read.parquet(accepted).filter(F.col("batch_id") >= 0)
    assert sorted(r.doc_id for r in surv.collect()) == [11, 12]
    got = spark.read.parquet(out).collect()
    assert sorted(r.doc_id for r in got) == [11, 12]
    by_id = {r.doc_id: r for r in got}
    assert by_id[11].n_removed == 8 and by_id[12].n_removed == 0


@pytest.mark.slow
def test_three_step_streaming_equals_three_step_pipeline(spark, tmp_path):
    """The FULL example shape (dedup → scrub → span dedup): two nights
    through the 3-step streaming twin == the same nights through the
    3-step batch Pipeline (examples/nightly_ingest.json with artifacts
    re-materialized nightly). Night 2 repeats a night-1 span, removed
    via the window-count artifact on both sides without re-reading
    night 1."""
    span = "aa bb cc dd ee ff gg hh"
    n1 = [
        (10, SEED_TEXT),                                 # seed dup
        (11, f"fresh doc with {BENCH} contamination body"),
        (12, f"fresh clean doc carrying {span} exactly once"),
    ]
    n2 = [
        (20, f"night two arrival {span} trailing here"),  # span repeat
        (21, "an entirely new document for night number two"),
    ]
    art = _artifact(spark, tmp_path)
    seed = spark.createDataFrame([(1, SEED_TEXT)], SCHEMA)

    # ---- streaming twin, 3-step
    landing = str(tmp_path / "landing")
    accepted = str(tmp_path / "accepted")
    out = str(tmp_path / "scrubbed")
    final = str(tmp_path / "final")
    wstate = str(tmp_path / "wstate")
    ckpt = str(tmp_path / "ckpt")
    seed_accepted_corpus(seed, accepted)
    for rows in (n1, n2):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        q = streaming_nightly_ingest(
            spark.readStream.schema(SCHEMA).parquet(landing),
            accepted, art, out, ckpt, threshold=0.5,
            span_state_path=wstate, final_path=final,
        )
        assert q.awaitTermination(180)
    got = sorted(spark.read.parquet(final).drop("batch_id").collect())

    # ---- batch Pipeline, 3 steps, same nights
    corpus = seed
    want = []
    bstate = str(tmp_path / "bstate")
    for tag, rows in (("n1", n1), ("n2", n2)):
        arts = str(tmp_path / f"arts_{tag}")
        materialize_dedup_artifacts(corpus, "doc_id", "text", arts)
        incoming = str(tmp_path / f"in_{tag}")
        staged = str(tmp_path / f"st_{tag}")
        clean = str(tmp_path / f"cl_{tag}")
        fin = str(tmp_path / f"fin_{tag}")
        spark.createDataFrame(rows, SCHEMA).write.parquet(incoming)
        REGISTRY["Pipeline"](spark, ParamsFile({
            "report_location": str(tmp_path / f"rep_{tag}"),
            "steps": [
                {"algorithm": "IncrementalDedup", "params": {
                    "action": "batch", "source_location": incoming,
                    "artifact_location": arts, "threshold": 0.5,
                    "target_location": staged,
                }},
                {"algorithm": "Decontaminate", "params": {
                    "source_location": staged,
                    "probe_artifact_location": art,
                    "target_location": clean,
                }},
                {"algorithm": "ExactSubstrDedup", "params": {
                    "source_location": clean,
                    "text_column": "clean_text",
                    "state_location": bstate,
                    "batch_tag": tag,
                    "span_tokens": 8,
                    "target_location": fin,
                }},
            ],
        })).run()
        corpus = corpus.unionByName(spark.read.parquet(staged))
        want.extend(spark.read.parquet(fin).collect())
    assert got == sorted(want)
    by_id = {r.doc_id: r for r in got}
    assert set(by_id) == {11, 12, 20, 21}
    assert by_id[20].n_removed == 8  # night-1 span removed via state
    assert by_id[12].n_removed == 0  # canonical night-1 site intact


@pytest.mark.slow
def test_three_step_batch_body_replay_idempotent(spark, tmp_path):
    """Replaying the 3-step batch body with the same batch_id rewrites
    corpus, scrubbed, final, and window-state partitions identically —
    the own-batch_id tag exclusion keeps the span election complete on
    the re-run."""
    span = "aa bb cc dd ee ff gg hh"
    art = _artifact(spark, tmp_path)
    accepted = str(tmp_path / "accepted")
    out = str(tmp_path / "scrubbed")
    final = str(tmp_path / "final")
    wstate = str(tmp_path / "wstate")
    seed_accepted_corpus(
        spark.createDataFrame([(1, SEED_TEXT)], SCHEMA), accepted
    )
    batch = spark.createDataFrame(
        [(11, f"body {BENCH} mid"), (12, f"keep {span} once")], SCHEMA
    )
    outs = []
    for _ in range(2):  # original + replay
        nightly_ingest_stream_batch(
            batch, 0, accepted, art, out, "doc_id", "text", 8,
            span_state_path=wstate, final_path=final, threshold=0.5,
        )
        outs.append(sorted(spark.read.parquet(final).collect()))
    assert outs[0] == outs[1]
    by_id = {r.doc_id: r for r in outs[1]}
    # the replay must NOT see its own counts: the unique span survives
    assert by_id[12].n_removed == 0 and "aa" in by_id[12].clean_text
    st = spark.read.parquet(wstate)
    assert {str(r.batch_tag) for r in st.collect()} == {"0"}
