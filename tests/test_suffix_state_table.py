"""The state_table probe source (round 16): the incremental
ExactSubstr CLI and the streaming nightly span step probe through the
gh-bucketed fold_state table UNION the not-yet-folded tag dirs —
bit-equal to probing every tag dir, refusing every inconsistent fold
shape (missing/crossed/crashed sidecar, replay of a folded batch)."""

import json
import shutil

import pytest

import m3d_engine_spark.operators.suffix  # noqa: F401 — populates REGISTRY
from m3d_engine_spark.config import ConfigError, ParamsFile
from m3d_engine_spark.operators.base import REGISTRY
from m3d_engine_spark.sources.dfs import DFS

SCHEMA = "doc_id int, text string"

B1 = [(1, "w1 w2 w3 w4 tailone")]
B2 = [(2, "u1 u2 u3 u4 tailtwo")]
B3 = [(3, "v1 v2 v3 v4 tailthree")]
# repeats b1's window (folded side must supply the count), b3's window
# (unfolded side must supply it), plus a batch-new window (kept)
B4 = [(10, "w1 w2 w3 w4 mid v1 v2 v3 v4 end x1 x2 x3 x4")]


def _run(spark, tmp_path, tag, rows, state, out_name, **extra):
    src = str(tmp_path / f"src_{out_name}")
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(src)
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


def _seed_state(spark, tmp_path, name):
    state = str(tmp_path / name)
    for tag, rows in (("n1", B1), ("n2", B2), ("n3", B3)):
        _run(spark, tmp_path, tag, rows, state, f"{name}_out_{tag}")
    return state


def _fold(spark, state, table, **kw):
    from conftest import drop_table_clean

    from m3d_engine_spark.operators.suffix import (
        materialize_window_count_table,
    )

    drop_table_clean(spark, table)
    materialize_window_count_table(spark, state, table, **kw)


def _rows(spark, path):
    return sorted(
        spark.read.parquet(path).collect(), key=lambda r: r.doc_id
    )


# ----------------------------------------------- equivalence pinning
@pytest.mark.slow
def test_state_table_probe_equals_tag_dir_probe(spark, tmp_path):
    """The headline contract: a batch probed through (fold table ∪
    unfolded dirs) — here n1+n2 folded, n3 still a dir — emits
    bit-identical output and state contribution to the same batch
    probed through the tag dirs alone, including removals sourced from
    BOTH sides of the union."""
    state_a = str(tmp_path / "state_a")
    for tag, rows in (("n1", B1), ("n2", B2)):
        _run(spark, tmp_path, tag, rows, state_a, f"a_out_{tag}")
    # fold the COMPLETED tags, then land one more night: n3 stays an
    # unfolded tag dir the table does not cover
    _fold(spark, state_a, "wc_fold_partial", num_buckets=4)
    _run(spark, tmp_path, "n3", B3, state_a, "a_out_n3")
    state_b = str(tmp_path / "state_b")
    shutil.copytree(state_a, state_b)
    out_a = _run(
        spark, tmp_path, "n4", B4, state_a, "out_table",
        state_table="wc_fold_partial",
    )
    out_b = _run(spark, tmp_path, "n4", B4, state_b, "out_dirs")
    assert _rows(spark, out_a) == _rows(spark, out_b)
    row = _rows(spark, out_a)[0]
    # both union sides contributed: w-window (folded) and v-window
    # (unfolded dir) removed, the batch-new x-window kept
    assert row.n_removed == 8 and "x1 x2 x3 x4" in row.clean_text
    assert "w1" not in row.clean_text and "v1" not in row.clean_text
    # the state contribution is identical too (pre-removal counts)
    assert sorted(
        spark.read.parquet(state_a + "/batch_tag=n4").collect()
    ) == sorted(spark.read.parquet(state_b + "/batch_tag=n4").collect())


@pytest.mark.slow
def test_state_table_probe_equals_with_everything_folded(spark, tmp_path):
    """All tags folded, zero unfolded dirs: the probe runs off the
    table alone and still matches the tag-dir run."""
    state_a = _seed_state(spark, tmp_path, "state_c")
    state_b = str(tmp_path / "state_d")
    shutil.copytree(state_a, state_b)
    _fold(spark, state_a, "wc_fold_all", num_buckets=4)
    out_a = _run(
        spark, tmp_path, "n4", B4, state_a, "out_table_all",
        state_table="wc_fold_all",
    )
    out_b = _run(spark, tmp_path, "n4", B4, state_b, "out_dirs_all")
    assert _rows(spark, out_a) == _rows(spark, out_b)


@pytest.mark.slow
def test_streaming_span_state_table_equals_tag_dirs(spark, tmp_path):
    """The streaming twin: night 2's span step probed through the fold
    of night 1's tag == probed through the tag dirs, bit-exact."""
    from m3d_engine_spark.operators.suffix import probe_gram_artifact
    from m3d_engine_spark.streaming.pipeline import (
        nightly_ingest_stream_batch,
        seed_accepted_corpus,
    )

    art = str(tmp_path / "artifact")
    probe_gram_artifact(
        spark.createDataFrame([(9, "m n o p q r s t")], SCHEMA),
        "text",
        span_tokens=8,
    ).write.parquet(art)
    (tmp_path / "artifact" / "_meta.json").write_text(
        json.dumps({"kind": "probe_gram_artifact", "span_tokens": 8})
    )
    night1 = [(30, "w1 w2 w3 w4 w5 w6 w7 w8 streaming night one")]
    night2 = [(40, "w1 w2 w3 w4 w5 w6 w7 w8 streaming night two")]

    def lineage(name, table=None):
        accepted = str(tmp_path / f"acc_{name}")
        out = str(tmp_path / f"out_{name}")
        final = str(tmp_path / f"final_{name}")
        span_state = str(tmp_path / f"span_{name}")
        seed_accepted_corpus(
            spark.createDataFrame([(1, "seed doc body")], SCHEMA), accepted
        )
        for bid, rows in ((0, night1), (1, night2)):
            if bid == 1 and table is not None:
                _fold(spark, span_state, table, num_buckets=4)
            nightly_ingest_stream_batch(
                spark.createDataFrame(rows, SCHEMA), bid, accepted, art,
                out, "doc_id", "text", 8,
                span_state_path=span_state, final_path=final,
                span_state_table=table if bid == 1 else None,
                threshold=0.5,
            )
        return sorted(
            spark.read.parquet(final + "/batch_id=1").collect()
        )

    assert lineage("tbl", table="wc_span_fold") == lineage("dirs")


# --------------------------------------------------- refusal surface
def test_state_table_without_incremental_mode_rejected(spark, tmp_path):
    for params in (
        {"state_table": "t"},  # no state_location/batch_tag at all
        {"state_table": "t", "state_location": str(tmp_path / "s")},
    ):
        with pytest.raises(ConfigError, match="state_table"):
            REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
                "source_location": str(tmp_path / "never-read"),
                "target_location": str(tmp_path / "out"),
                **params,
            })).run()


def test_state_buckets_outside_fold_state_rejected(spark, tmp_path):
    with pytest.raises(ConfigError, match="state_buckets"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "source_location": str(tmp_path / "never-read"),
            "target_location": str(tmp_path / "out"),
            "state_buckets": 8,
        })).run()


def test_state_table_without_fold_sidecar_rejected(spark, tmp_path):
    """state_table over a state no fold_state run ever committed:
    loud, naming the fix — probing table-only would silently drop
    every tag dir's counts."""
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [("h1", 2)], "gh string, cnt long"
    ).write.parquet(state + "/batch_tag=n1")
    src = str(tmp_path / "src")
    spark.createDataFrame(B4, SCHEMA).write.parquet(src)
    with pytest.raises(ConfigError, match="fold_state"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "source_location": src,
            "state_location": state,
            "batch_tag": "n4",
            "state_table": "wc_never_folded",
            "target_location": str(tmp_path / "out"),
        })).run()


@pytest.mark.slow
def test_fold_sidecar_crossed_or_crashed_rejected(spark, tmp_path):
    """A sidecar naming a different table (config mixup) and a
    fold-id mismatch (a fold died between table write and sidecar
    commit) both refuse the probe."""
    from m3d_engine_spark.operators.suffix import read_fold_sidecar

    state = _seed_state(spark, tmp_path, "state_x")
    _fold(spark, state, "wc_crossed", num_buckets=2)
    with pytest.raises(ConfigError, match="state_table|table"):
        read_fold_sidecar(spark, state, "some_other_table")
    # simulate the crash window: sidecar from a PREVIOUS fold
    sidecar = json.loads((DFS(spark)).read_text(
        state + "/_folded_tags.json"
    ))
    sidecar["fold_id"] = "0" * 32
    DFS(spark).write_text(
        state + "/_folded_tags.json", json.dumps(sidecar)
    )
    with pytest.raises(ConfigError, match="fold_id"):
        read_fold_sidecar(spark, state, "wc_crossed")


@pytest.mark.slow
def test_replay_of_folded_batch_rejected(spark, tmp_path):
    """A batch whose OWN tag is already folded cannot be replayed
    through state_table: its counts sit pre-summed in the table where
    the own-tag exclusion cannot reach them."""
    state = _seed_state(spark, tmp_path, "state_y")
    _fold(spark, state, "wc_replay", num_buckets=2)
    src = str(tmp_path / "src_replay")
    spark.createDataFrame(B3, SCHEMA).write.parquet(src)
    with pytest.raises(ConfigError, match="already folded"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "source_location": src,
            "state_location": state,
            "batch_tag": "n3",
            "state_table": "wc_replay",
            "target_location": str(tmp_path / "out_replay"),
        })).run()


@pytest.mark.slow
def test_folded_dir_rewritten_after_fold_rejected(spark, tmp_path):
    """The review finding: a folded tag dir replayed (or compacted)
    AFTER the fold leaves the table's pre-summed counts stale — the
    per-tag content signatures in the sidecar catch the drift and the
    probe refuses instead of silently admitting the replay's new
    windows and over-scrubbing against its removed ones."""
    state = _seed_state(spark, tmp_path, "state_drift")
    _fold(spark, state, "wc_drift", num_buckets=2)
    # backfill night n1 with corrected counts, the tag-dir way (which
    # is legal on its own — the dirs stay the source of truth)
    spark.createDataFrame(
        [("zz", 9)], "gh string, cnt long"
    ).write.mode("overwrite").parquet(state + "/batch_tag=n1")
    src = str(tmp_path / "src_after_drift")
    spark.createDataFrame(B4, SCHEMA).write.parquet(src)
    with pytest.raises(ConfigError, match="rewritten or deleted AFTER"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "source_location": src,
            "state_location": state,
            "batch_tag": "n9",
            "state_table": "wc_drift",
            "target_location": str(tmp_path / "out_drift"),
        })).run()


@pytest.mark.slow
def test_fold_up_to_leaves_recent_tags_unfolded(spark, tmp_path):
    """fold_up_to is how 'completed' is configured: tags above the
    cutoff stay plain dirs — the sidecar records only the folded
    subset, the probe unions the rest, and a backfill of an unfolded
    tag needs no re-fold."""
    from m3d_engine_spark.operators.suffix import read_fold_sidecar

    state_a = _seed_state(spark, tmp_path, "state_cut")
    state_b = str(tmp_path / "state_cut_b")
    shutil.copytree(state_a, state_b)
    _fold(spark, state_a, "wc_cut", num_buckets=2, up_to_tag="n2")
    meta = read_fold_sidecar(spark, state_a, "wc_cut")
    assert meta["tags"] == ["batch_tag=n1", "batch_tag=n2"]
    out_a = _run(
        spark, tmp_path, "n4", B4, state_a, "out_cut_table",
        state_table="wc_cut",
    )
    out_b = _run(spark, tmp_path, "n4", B4, state_b, "out_cut_dirs")
    assert _rows(spark, out_a) == _rows(spark, out_b)
    # a cutoff excluding everything is a loud error, not an empty fold
    with pytest.raises(ValueError, match="excludes every"):
        _fold(spark, state_b, "wc_cut_none", up_to_tag="a")


@pytest.mark.slow
def test_qualified_table_name_and_dropped_table(spark, tmp_path):
    """Qualified vs unqualified spellings of the fold table name are
    the same relation (no false refusal); a dropped table refuses
    with the rebuild remediation instead of a raw AnalysisException;
    a corrupted sidecar refuses as corrupt, not as a JSON traceback."""
    from m3d_engine_spark.operators.suffix import read_fold_sidecar

    state = _seed_state(spark, tmp_path, "state_q")
    _fold(spark, state, "wc_qual", num_buckets=2)
    meta = read_fold_sidecar(spark, state, "default.wc_qual")
    assert meta["tags"]  # accepted despite the qualified spelling
    spark.sql("DROP TABLE wc_qual")
    with pytest.raises(ConfigError, match="not readable"):
        read_fold_sidecar(spark, state, "wc_qual")
    DFS(spark).write_text(
        state + "/_folded_tags.json", "{truncated-by-a-crash"
    )
    with pytest.raises(ConfigError, match="not parseable"):
        read_fold_sidecar(spark, state, "wc_qual")


@pytest.mark.slow
def test_folded_dir_deleted_after_fold_rejected(spark, tmp_path):
    """A folded dir DELETED since the fold (retention sweep) is the
    same staleness class as a rewrite: the table still serves its
    counts while the dirs — the declared source of truth — no longer
    hold it. Refused, not skipped."""
    from m3d_engine_spark.operators.suffix import window_count_state

    state = _seed_state(spark, tmp_path, "state_del")
    _fold(spark, state, "wc_del", num_buckets=2)
    shutil.rmtree(state + "/batch_tag=n1")
    with pytest.raises(ConfigError, match="rewritten or deleted"):
        window_count_state(spark, state, "n9", state_table="wc_del")


@pytest.mark.slow
def test_sidecar_without_tag_sigs_rejected(spark, tmp_path):
    """A sidecar predating the content signatures cannot prove the
    folded dirs are undrifted — refused with the re-fold remediation,
    never misdiagnosed as a replay."""
    from m3d_engine_spark.operators.suffix import window_count_state

    state = _seed_state(spark, tmp_path, "state_presig")
    _fold(spark, state, "wc_presig", num_buckets=2)
    sidecar = json.loads(
        DFS(spark).read_text(state + "/_folded_tags.json")
    )
    del sidecar["tag_sigs"]
    DFS(spark).write_text(
        state + "/_folded_tags.json", json.dumps(sidecar)
    )
    with pytest.raises(ConfigError, match="predates"):
        window_count_state(spark, state, "n9", state_table="wc_presig")


@pytest.mark.slow
def test_fold_sweeps_tmp_sidecar_litter(spark, tmp_path):
    """A crashed fold's _folded_tags.json.__tmp_* orphan is reclaimed
    by the next fold — nothing else ever lists it."""
    state = _seed_state(spark, tmp_path, "state_litter")
    litter = state + "/_folded_tags.json.__tmp_deadbeef"
    DFS(spark).write_text(litter, "{\"half\": ")
    _fold(spark, state, "wc_litter", num_buckets=2)
    assert not DFS(spark).exists(litter)
    assert DFS(spark).exists(state + "/_folded_tags.json")


def test_fold_up_to_validation(spark, tmp_path):
    """fold_up_to outside fold_state is the silent-no-op class
    (refused), and a boolean typo would sort above every date tag and
    fold everything (refused as non-string)."""
    with pytest.raises(ConfigError, match="fold_up_to"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "source_location": str(tmp_path / "never-read"),
            "target_location": str(tmp_path / "out"),
            "fold_up_to": "2026-08-09",
        })).run()
    with pytest.raises(ConfigError, match="string tag cutoff"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "action": "fold_state",
            "state_location": str(tmp_path / "s"),
            "state_table": "wc_t",
            "fold_up_to": True,
        })).run()


def test_streaming_span_state_table_requires_span_step(spark, tmp_path):
    from m3d_engine_spark.streaming.pipeline import (
        streaming_nightly_ingest,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))
    with pytest.raises(ValueError, match="span_state_table"):
        streaming_nightly_ingest(
            stream, str(tmp_path / "acc"), str(tmp_path / "art"),
            str(tmp_path / "out"), str(tmp_path / "ckpt"),
            span_state_table="wc_whatever",
        )
