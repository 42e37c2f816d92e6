"""The scrubbed-ids fold (round 16, the Decontaminate sibling of the
window-count fold): the tagged incremental scrub probed through the
id-bucketed fold_state table == probed through the tag dirs bit-exact,
with the shared sidecar/drift refusal surface and a kind check so the
two fold families can never cross."""

import shutil

import pytest

import m3d_engine_spark.operators.suffix  # noqa: F401 — populates REGISTRY
from m3d_engine_spark.config import ConfigError, ParamsFile
from m3d_engine_spark.operators.base import REGISTRY

SCHEMA = "doc_id int, text string"
BENCH = "m n o p q"


def _setup(spark, tmp_path):
    probes = str(tmp_path / "probes")
    spark.createDataFrame([(9, BENCH)], SCHEMA).write.parquet(probes)
    return probes


def _scrub(spark, tmp_path, probes, tag, rows, state, out_name, **extra):
    src = str(tmp_path / f"src_{out_name}")
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(src)
    out = str(tmp_path / out_name)
    REGISTRY["Decontaminate"](spark, ParamsFile({
        "source_location": src,
        "probe_location": probes,
        "state_location": state,
        "batch_tag": tag,
        "span_tokens": 3,
        "target_location": out,
        **extra,
    })).run()
    return out


def _fold_ids(spark, state, table, **kw):
    from conftest import drop_table_clean

    drop_table_clean(spark, table)
    REGISTRY["Decontaminate"](spark, ParamsFile({
        "action": "fold_state",
        "state_location": state,
        "state_table": table,
        "state_buckets": 4,
        **kw,
    })).run()


B1 = [(1, f"doc one with {BENCH} inside"), (2, "clean doc two body")]
B2 = [(3, "another clean doc three")]
# re-lands docs 1 and 3 (recorded — must skip) plus a new doc
B3 = [(1, f"doc one with {BENCH} inside"), (3, "another clean doc three"),
      (7, "a brand new document seven")]


@pytest.mark.slow
def test_ids_table_probe_equals_tag_dir_probe(spark, tmp_path):
    """Batch 3 probed through (id-bucketed fold of n1 ∪ unfolded n2
    dir) emits bit-identical output and state contribution to the
    tag-dir-only run: recorded docs 1 and 3 skip (one via the table,
    one via the unfolded dir), only the new doc lands."""
    probes = _setup(spark, tmp_path)
    state_a = str(tmp_path / "state_a")
    _scrub(spark, tmp_path, probes, "n1", B1, state_a, "a_out_n1")
    _fold_ids(spark, state_a, "ids_fold_partial")
    _scrub(spark, tmp_path, probes, "n2", B2, state_a, "a_out_n2")
    state_b = str(tmp_path / "state_b")
    shutil.copytree(state_a, state_b)
    out_a = _scrub(
        spark, tmp_path, probes, "n3", B3, state_a, "out_table",
        state_table="ids_fold_partial",
    )
    out_b = _scrub(spark, tmp_path, probes, "n3", B3, state_b, "out_dirs")
    rows_a = sorted(spark.read.parquet(out_a).collect())
    rows_b = sorted(spark.read.parquet(out_b).collect())
    assert rows_a == rows_b
    assert [r.doc_id for r in rows_a] == [7]
    assert sorted(
        r.doc_id
        for r in spark.read.parquet(state_a + "/batch_tag=n3").collect()
    ) == sorted(
        r.doc_id
        for r in spark.read.parquet(state_b + "/batch_tag=n3").collect()
    ) == [7]


@pytest.mark.slow
def test_replay_of_folded_scrub_batch_rejected(spark, tmp_path):
    """A replay of a batch whose ids are already folded cannot exclude
    its own contribution — without the refusal it would anti-join its
    own ids out and overwrite the night's output with an empty frame
    (the data-destruction class the tagged layout exists to close)."""
    probes = _setup(spark, tmp_path)
    state = str(tmp_path / "state")
    _scrub(spark, tmp_path, probes, "n1", B1, state, "out_n1")
    _fold_ids(spark, state, "ids_fold_replay")
    with pytest.raises(ConfigError, match="already folded"):
        _scrub(
            spark, tmp_path, probes, "n1", B1, state, "out_n1_replay",
            state_table="ids_fold_replay",
        )


@pytest.mark.slow
def test_fold_kinds_cannot_cross(spark, tmp_path):
    """A scrubbed-ids fold sidecar refuses a window-count probe (and
    vice versa) — the two families share the protocol but never the
    state: probing counts against an id table would silently scrub
    nothing."""
    from m3d_engine_spark.operators.suffix import read_fold_sidecar

    probes = _setup(spark, tmp_path)
    state = str(tmp_path / "state")
    _scrub(spark, tmp_path, probes, "n1", B1, state, "out_n1")
    _fold_ids(spark, state, "ids_fold_kind")
    read_fold_sidecar(
        spark, state, "ids_fold_kind", "scrubbed_ids_fold"
    )  # own kind: accepted
    with pytest.raises(ConfigError, match="different state family"):
        read_fold_sidecar(spark, state, "ids_fold_kind")


def test_fold_state_and_state_table_validation(spark, tmp_path):
    """The prepare() refusal surface: fold_state needs its pair and
    rejects inapplicable keys; state_table needs the tagged
    incremental mode; fold dials outside fold_state are the silent
    no-op class."""
    with pytest.raises(ConfigError, match="fold_state needs"):
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "action": "fold_state",
            "state_location": str(tmp_path / "s"),
        })).run()
    with pytest.raises(ConfigError, match="does not apply"):
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "action": "fold_state",
            "state_location": str(tmp_path / "s"),
            "state_table": "t",
            "probe_location": str(tmp_path / "p"),
        })).run()
    with pytest.raises(ConfigError, match="unknown action"):
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "action": "defold",
        })).run()
    base = {
        "source_location": str(tmp_path / "never-read"),
        "probe_location": str(tmp_path / "never-read-either"),
        "target_location": str(tmp_path / "out"),
    }
    with pytest.raises(ConfigError, match="state_table"):
        REGISTRY["Decontaminate"](spark, ParamsFile({
            **base, "state_table": "t",
            "state_location": str(tmp_path / "s"),  # no batch_tag
        })).run()
    for bad in ("state_buckets", "fold_up_to"):
        with pytest.raises(ConfigError, match=bad):
            REGISTRY["Decontaminate"](spark, ParamsFile({
                **base,
                bad: 8 if bad == "state_buckets" else "2026-01-01",
            })).run()
