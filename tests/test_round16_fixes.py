"""Round-16 fixes (ADVICE r15): compaction swap-litter recovery must
run BEFORE the state read (the flat-layout data-destruction window),
the flat read path refuses a missing state with a surviving backup,
the orphan-backup remediation message now names a re-run that works,
and compact_state_over_files without a state to compact fails loudly.
"""

import pytest

import m3d_engine_spark.operators.suffix  # noqa: F401 — populates REGISTRY
from m3d_engine_spark.config import ConfigError, ParamsFile
from m3d_engine_spark.operators.base import REGISTRY
from m3d_engine_spark.sources.dfs import DFS


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id int, text string").write.mode(
        "overwrite"
    ).parquet(path)


def _decon_params(tmp_path, batch, **extra):
    return ParamsFile({
        "source_location": str(tmp_path / f"src_{batch}"),
        "probe_location": str(tmp_path / "probes"),
        "state_location": str(tmp_path / "state"),
        "target_location": str(tmp_path / f"out_{batch}"),
        "span_tokens": 3,
        **extra,
    })


def _setup_decon(spark, tmp_path):
    _write_docs(spark, str(tmp_path / "probes"), [(9, "m n o p q")])
    _write_docs(
        spark,
        str(tmp_path / "src_b1"),
        [(1, "a b c d e"), (2, "f g h i j")],
    )
    _write_docs(
        spark,
        str(tmp_path / "src_b2"),
        [(1, "a b c d e"), (3, "k l m n o")],
    )


def _simulate_crashed_flat_compaction(spark, state):
    """AtomicWriter killed between its two renames: base → backup done,
    tmp → base never happened. The backup holds the whole state."""
    dfs = DFS(spark)
    assert dfs.rename(state, state + "__bak_123456")
    assert not dfs.exists(state)
    return dfs


# ---------------------------------- flat layout: recovery BEFORE read
@pytest.mark.slow
def test_flat_state_crashed_compaction_recovers_before_read(
    spark, tmp_path
):
    """The ADVICE-r15 high finding, closed end-to-end: batch 1 records
    ids in a FLAT state, a compaction crash renames the state away,
    and batch 2 (compact_state_over_files set) must restore the backup
    in prepare() — anti-joining batch-1 docs out instead of silently
    re-scrubbing them, with the state ending as the union of both
    batches and no backup litter left."""
    _setup_decon(spark, tmp_path)
    state = str(tmp_path / "state")
    REGISTRY["Decontaminate"](
        spark, _decon_params(tmp_path, "b1")
    ).run()
    assert {r.doc_id for r in spark.read.parquet(state).collect()} == {1, 2}

    dfs = _simulate_crashed_flat_compaction(spark, state)
    REGISTRY["Decontaminate"](
        spark,
        _decon_params(tmp_path, "b2", compact_state_over_files=100),
    ).run()
    # doc 1 was recorded by batch 1: the restored state anti-joins it
    # out, so batch 2's output is exactly the new doc
    out2 = spark.read.parquet(str(tmp_path / "out_b2"))
    assert {r.doc_id for r in out2.collect()} == {3}
    assert {r.doc_id for r in spark.read.parquet(state).collect()} == {
        1, 2, 3,
    }
    assert not dfs.exists(state + "__bak_123456")


def test_flat_state_missing_with_backup_refuses_empty_read(
    spark, tmp_path
):
    """Belt-and-braces for the same crash when the compaction dial was
    REMOVED afterwards: the read path must refuse to treat the missing
    flat state as empty while the backup sibling survives — silence
    here re-scrubs every recorded doc and sets up the later recovery
    to delete the backup."""
    _setup_decon(spark, tmp_path)
    state = str(tmp_path / "state")
    REGISTRY["Decontaminate"](
        spark, _decon_params(tmp_path, "b1")
    ).run()
    _simulate_crashed_flat_compaction(spark, state)
    with pytest.raises(ConfigError, match="backup"):
        REGISTRY["Decontaminate"](
            spark, _decon_params(tmp_path, "b2")
        ).run()
    # and the backup is still there — refusing must not mutate state
    assert DFS(spark).exists(state + "__bak_123456")


# -------------------------------- tagged layout: the re-run now works
@pytest.mark.slow
def test_tagged_orphan_backup_rerun_with_compaction_succeeds(
    spark, tmp_path
):
    """The ADVICE-r15 medium finding: the orphan-backup error's
    suggested remediation ('re-run with compact_state_over_files set')
    used to fail identically every time because recovery only ran in
    write(), after transform() raised. With recovery in prepare(), the
    suggested re-run restores the tag dir and completes."""
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [("h1", 2)], "gh string, cnt long"
    ).write.parquet(state + "/batch_tag=n1")
    dfs = DFS(spark)
    assert dfs.rename(
        state + "/batch_tag=n1", state + "/batch_tag=n1__bak_777"
    )
    src = str(tmp_path / "src")
    _write_docs(spark, src, [(10, "a b c d e f g h tail")])
    params = {
        "source_location": src,
        "state_location": state,
        "batch_tag": "n2",
        "target_location": str(tmp_path / "out"),
    }
    # without the dial: loud refusal naming the working remediations
    with pytest.raises(ConfigError, match="orphan"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile(params)).run()
    # the advertised re-run: recovery restores the backup, run passes
    REGISTRY["ExactSubstrDedup"](
        spark, ParamsFile({**params, "compact_state_over_files": 100})
    ).run()
    assert dfs.exists(state + "/batch_tag=n1")
    assert not dfs.exists(state + "/batch_tag=n1__bak_777")
    assert dfs.exists(state + "/batch_tag=n2")


# ------------------------------- compaction dial without state: loud
def test_compact_without_state_location_rejected(spark, tmp_path):
    """compact_state_over_files without state_location used to be a
    silent no-op — the config class this surface rejects everywhere
    else. Both state-bearing algorithms fail in prepare(), before any
    read (bogus source paths prove the fail-fast)."""
    with pytest.raises(ConfigError, match="state_location"):
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "source_location": str(tmp_path / "never-read"),
            "probe_location": str(tmp_path / "never-read-either"),
            "target_location": str(tmp_path / "out"),
            "compact_state_over_files": 4,
        })).run()
    with pytest.raises(ConfigError, match="state_location"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "source_location": str(tmp_path / "never-read"),
            "target_location": str(tmp_path / "out"),
            "compact_state_over_files": 4,
        })).run()
