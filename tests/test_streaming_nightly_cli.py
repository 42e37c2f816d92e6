"""StreamingNightlyIngest — the 3-step streaming nightly as a
params-driven acon: CLI invocations == direct streaming_nightly_ingest
wiring bit-exact over two nights, and the prepare() refusal surface
for half-configured span steps."""

import json

import pytest

import m3d_engine_spark.streaming.pipeline  # noqa: F401 — populates REGISTRY
from m3d_engine_spark.config import ConfigError, ParamsFile
from m3d_engine_spark.operators.base import REGISTRY
from m3d_engine_spark.operators.suffix import probe_gram_artifact
from m3d_engine_spark.streaming.pipeline import (
    seed_accepted_corpus,
    streaming_nightly_ingest,
)

SCHEMA = "doc_id int, text string"
BENCH = "m n o p q r s t"
SEED_TEXT = "seed corpus doc body that is already in the lake tonight"
SPAN = "aa bb cc dd ee ff gg hh"
N1 = [
    (10, SEED_TEXT),
    (11, f"fresh doc with {BENCH} contamination body"),
    (12, f"fresh clean doc carrying {SPAN} exactly once"),
]
N2 = [
    (20, f"night two arrival {SPAN} trailing here"),
    (21, "an entirely new document for night number two"),
]


def _schema_json(spark):
    return spark.createDataFrame([], SCHEMA).schema.jsonValue()


def _artifact(spark, tmp_path):
    loc = str(tmp_path / "artifact")
    probe_gram_artifact(
        spark.createDataFrame([(9, BENCH)], SCHEMA), "text", span_tokens=8
    ).write.parquet(loc)
    (tmp_path / "artifact" / "_meta.json").write_text(
        json.dumps({"kind": "probe_gram_artifact", "span_tokens": 8})
    )
    return loc


@pytest.mark.slow
def test_cli_equals_direct_wiring(spark, tmp_path):
    """Two nights through the acon == the same nights through the
    library function, bit-exact across all three output relations
    (accepted corpus, scrubbed, final) — the CLI adds only the params
    surface, never different semantics. span_tokens omitted on the
    CLI side: the sidecar adoption path is the one exercised."""
    art = _artifact(spark, tmp_path)

    def lineage(name, runner):
        landing = str(tmp_path / f"landing_{name}")
        paths = {
            k: str(tmp_path / f"{k}_{name}")
            for k in ("accepted", "out", "final", "wstate", "ckpt")
        }
        seed_accepted_corpus(
            spark.createDataFrame([(1, SEED_TEXT)], SCHEMA),
            paths["accepted"],
        )
        for rows in (N1, N2):
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(landing)
            runner(landing, paths)
        return {
            k: sorted(spark.read.parquet(paths[k]).collect())
            for k in ("accepted", "out", "final")
        }

    def run_cli(landing, paths):
        REGISTRY["StreamingNightlyIngest"](spark, ParamsFile({
            "source_dir": landing,
            "schema": _schema_json(spark),
            "accepted_location": paths["accepted"],
            "probe_artifact_location": art,
            "target_location": paths["out"],
            "checkpoint_location": paths["ckpt"],
            "threshold": 0.5,
            "span_state_location": paths["wstate"],
            "final_location": paths["final"],
        })).run()

    def run_direct(landing, paths):
        q = streaming_nightly_ingest(
            spark.readStream.schema(SCHEMA).parquet(landing),
            paths["accepted"], art, paths["out"], paths["ckpt"],
            threshold=0.5,
            span_state_path=paths["wstate"], final_path=paths["final"],
        )
        assert q.awaitTermination(180)

    got = lineage("cli", run_cli)
    want = lineage("lib", run_direct)
    assert got == want
    by_id = {r.doc_id: r for r in got["final"]}
    assert set(by_id) == {11, 12, 20, 21}
    assert by_id[20].n_removed == 8 and by_id[12].n_removed == 0


def test_prepare_refuses_half_configured_span_step(spark, tmp_path):
    base = {
        "source_dir": str(tmp_path / "landing"),
        "schema": _schema_json(spark),
        "accepted_location": str(tmp_path / "acc"),
        "probe_artifact_location": str(tmp_path / "art"),
        "target_location": str(tmp_path / "out"),
        "checkpoint_location": str(tmp_path / "ckpt"),
    }
    with pytest.raises(ConfigError, match="TOGETHER"):
        REGISTRY["StreamingNightlyIngest"](spark, ParamsFile({
            **base, "span_state_location": str(tmp_path / "ws"),
        })).run()
    for bad in ("span_dedup_tokens", "span_min_occurrences",
                "span_state_table"):
        with pytest.raises(ConfigError, match=bad):
            REGISTRY["StreamingNightlyIngest"](spark, ParamsFile({
                **base, bad: 8 if bad != "span_state_table" else "wc_t",
            })).run()
    with pytest.raises(ConfigError, match="span_min_occurrences"):
        REGISTRY["StreamingNightlyIngest"](spark, ParamsFile({
            **base,
            "span_state_location": str(tmp_path / "ws"),
            "final_location": str(tmp_path / "fin"),
            "span_min_occurrences": 1,  # would delete every window
        })).run()
    # JSON null is 'commented out' — null-valued keys behave exactly
    # like absent ones on BOTH sides of every guard
    with pytest.raises(ConfigError, match="span_dedup_tokens"):
        REGISTRY["StreamingNightlyIngest"](spark, ParamsFile({
            **base,
            "span_state_location": None,
            "final_location": None,
            "span_dedup_tokens": 4,
        })).run()
    with pytest.raises(ConfigError, match="TOGETHER"):
        REGISTRY["StreamingNightlyIngest"](spark, ParamsFile({
            **base,
            "span_state_location": str(tmp_path / "ws"),
            "final_location": None,
        })).run()
    # typo'd dedup dials fail in prepare(), naming the key — a boolean
    # num_hashes would silently gut LSH candidate generation
    with pytest.raises(ConfigError, match="num_hashes"):
        REGISTRY["StreamingNightlyIngest"](spark, ParamsFile({
            **base, "num_hashes": True,
        })).run()
    for bad in (True, 1.5, "hot"):
        with pytest.raises(ConfigError, match="threshold"):
            REGISTRY["StreamingNightlyIngest"](spark, ParamsFile({
                **base, "threshold": bad,
            })).run()
