"""The weekly corpus-maintenance composition
(examples/weekly_maintenance.json): compact_state as a standalone
Pipeline step, fold_state feeding the nightly state_table probe, and
the headline contract — maintenance between two nightly batches
changes NOTHING in the nights' outputs, bit-exact."""

import shutil

import pytest

import m3d_engine_spark.operators.chain  # noqa: F401 — Pipeline registry
import m3d_engine_spark.operators.suffix  # noqa: F401
from m3d_engine_spark.config import ConfigError, ParamsFile
from m3d_engine_spark.operators.base import REGISTRY
from m3d_engine_spark.sources.dfs import DFS

SCHEMA = "doc_id int, text string"
N1 = [(1, "w1 w2 w3 w4 first night body")]
N2 = [(10, "w1 w2 w3 w4 second night repeats the span x1 x2 x3 x4")]


def _night(spark, tmp_path, tag, rows, state, out_name, **extra):
    src = str(tmp_path / f"src_{out_name}")
    spark.createDataFrame(rows, SCHEMA).repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    out = str(tmp_path / out_name)
    REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
        "source_location": src,
        "state_location": state,
        "batch_tag": tag,
        "span_tokens": 4,
        "target_location": out,
        **extra,
    })).run()
    return out


def _count_files(spark, path):
    return len(DFS(spark).committed_files(path))


def _fragment(spark, path, n=4):
    """Rewrite a state leaf dir as n small files — the shape a week of
    nightly appends accretes — without changing its rows."""
    df = spark.read.parquet(path)
    rows, schema = df.collect(), df.schema
    spark.createDataFrame(rows, schema).repartition(n).write.mode(
        "overwrite"
    ).parquet(path)


@pytest.mark.slow
def test_maintenance_between_nights_changes_nothing(spark, tmp_path):
    """Two cycles, two lineages: A runs night 1 → the weekly
    maintenance Pipeline (compact_state + fold_state, the example's
    step shapes) → night 2 probed through the folded table; B runs
    the same nights back-to-back with no maintenance. Night 2's
    output and state contribution are bit-identical — maintenance is
    pure bookkeeping."""
    from conftest import drop_table_clean

    state_a = str(tmp_path / "state_a")
    _night(spark, tmp_path, "n1", N1, state_a, "a_out_n1")
    _fragment(spark, state_a + "/batch_tag=n1")
    state_b = str(tmp_path / "state_b")
    shutil.copytree(state_a, state_b)

    drop_table_clean(spark, "wc_weekly")
    before = _count_files(spark, state_a + "/batch_tag=n1")
    assert before > 1  # the fragmented week's worth of small files
    REGISTRY["Pipeline"](spark, ParamsFile({
        "report_location": str(tmp_path / "report"),
        "steps": [
            {"algorithm": "ExactSubstrDedup", "params": {
                "action": "compact_state",
                "state_location": state_a,
                "compact_state_over_files": 1,
            }},
            {"algorithm": "ExactSubstrDedup", "params": {
                "action": "fold_state",
                "state_location": state_a,
                "state_table": "wc_weekly",
                "state_buckets": 4,
            }},
        ],
    })).run()
    assert _count_files(spark, state_a + "/batch_tag=n1") < before
    # compaction is layout-only: same (gh, cnt) multiset
    assert sorted(
        spark.read.parquet(state_a + "/batch_tag=n1").collect()
    ) == sorted(spark.read.parquet(state_b + "/batch_tag=n1").collect())

    out_a = _night(
        spark, tmp_path, "n2", N2, state_a, "a_out_n2",
        state_table="wc_weekly",
    )
    out_b = _night(spark, tmp_path, "n2", N2, state_b, "b_out_n2")
    rows_a = sorted(spark.read.parquet(out_a).collect())
    rows_b = sorted(spark.read.parquet(out_b).collect())
    assert rows_a == rows_b
    assert rows_a[0].n_removed == 4  # the repeated night-1 span went
    assert sorted(
        spark.read.parquet(state_a + "/batch_tag=n2").collect()
    ) == sorted(spark.read.parquet(state_b + "/batch_tag=n2").collect())


@pytest.mark.slow
def test_compact_state_action_on_flat_scrubbed_ids(spark, tmp_path):
    """The second example step: compact_state over the Decontaminate
    flat scrubbed-ids dir (the whole dir is one leaf) — fewer files,
    identical ids, and the next incremental night still anti-joins
    the recorded docs out."""
    probes = str(tmp_path / "probes")
    spark.createDataFrame([(9, "m n o p q")], SCHEMA).write.parquet(probes)
    state = str(tmp_path / "state")

    def scrub(batch, rows):
        src = str(tmp_path / f"src_{batch}")
        spark.createDataFrame(rows, SCHEMA).repartition(4).write.parquet(src)
        out = str(tmp_path / f"out_{batch}")
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "source_location": src,
            "probe_location": probes,
            "state_location": state,
            "span_tokens": 3,
            "target_location": out,
        })).run()
        return out

    scrub("b1", [(1, "a b c d e"), (2, "f g h i j")])
    _fragment(spark, state)
    before = _count_files(spark, state)
    assert before > 1
    REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
        "action": "compact_state",
        "state_location": state,
        "compact_state_over_files": 1,
    })).run()
    assert _count_files(spark, state) < before
    assert {r.doc_id for r in spark.read.parquet(state).collect()} == {1, 2}
    out2 = scrub("b2", [(1, "a b c d e"), (3, "k l m n o")])
    assert {r.doc_id for r in spark.read.parquet(out2).collect()} == {3}


def test_compact_state_validation(spark, tmp_path):
    """Missing keys and non-applicable keys both refuse before any
    filesystem work."""
    with pytest.raises(ConfigError, match="compact_state needs"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "action": "compact_state",
            "state_location": str(tmp_path / "s"),
        })).run()
    with pytest.raises(ConfigError, match="does not apply"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "action": "compact_state",
            "state_location": str(tmp_path / "s"),
            "compact_state_over_files": 4,
            "target_location": str(tmp_path / "out"),
        })).run()
    with pytest.raises(ConfigError, match="unknown action"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "action": "compact_everything",
            "state_location": str(tmp_path / "s"),
        })).run()
