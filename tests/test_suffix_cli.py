"""Round-14 depth: the ExactSubstrDedup params CLI (library==CLI
round-trips, action validation) and the incremental Decontaminate
state composition (two-batch equivalence vs from-scratch,
idempotency, post-commit state ordering)."""

import json
import os

import pytest

import m3d_engine_spark.operators.suffix  # noqa: F401 — populates REGISTRY
from m3d_engine_spark.config import ConfigError, ParamsFile
from m3d_engine_spark.operators.base import REGISTRY, run_algorithm


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id int, text string").write.parquet(path)


REP = "a b c d e f g h"  # the repeated 8-gram


@pytest.fixture()
def corpus(spark, tmp_path):
    loc = str(tmp_path / "corpus")
    _write_docs(spark, loc, [
        (1, f"{REP} tail one"),
        (2, f"lead {REP} tail two"),
        (3, "entirely unique text with no repeats at all"),
    ])
    return loc


@pytest.mark.slow
def test_exact_substr_cli_dedup_matches_library(spark, tmp_path, corpus):
    from m3d_engine_spark.operators.suffix import exact_substr_dedup

    out = str(tmp_path / "out")
    p = tmp_path / "p.json"
    p.write_text(json.dumps({
        "source_location": corpus,
        "span_tokens": 8,
        "min_occurrences": 2,
        "target_location": out,
    }))
    run_algorithm(spark, "ExactSubstrDedup", str(p))
    got = sorted(spark.read.parquet(out).collect())
    want = sorted(
        exact_substr_dedup(
            spark.read.parquet(corpus), "doc_id", "text",
            span_tokens=8, min_occurrences=2,
        ).collect()
    )
    assert got == want
    by_id = {r.doc_id: r for r in got}
    # doc 1 is the canonical (min doc,pos) occurrence and keeps its
    # text; doc 2 loses the repeated "<REP>" AND the overlapping
    # repeated window "b..h tail" = 9 covered tokens
    assert by_id[1].n_removed == 0 and by_id[2].n_removed == 9
    assert by_id[2].clean_text == "lead two"


@pytest.mark.slow
def test_exact_substr_cli_spans_action_and_validation(spark, tmp_path, corpus):
    from m3d_engine_spark.operators.suffix import exact_substr_spans

    out = str(tmp_path / "spans")
    run_algorithm_params = {
        "action": "spans",
        "source_location": corpus,
        "span_tokens": 8,
        "target_location": out,
    }
    p = tmp_path / "p.json"
    p.write_text(json.dumps(run_algorithm_params))
    run_algorithm(spark, "ExactSubstrDedup", str(p))
    got = sorted(spark.read.parquet(out).collect())
    want = sorted(
        exact_substr_spans(
            spark.read.parquet(corpus), "doc_id", "text", span_tokens=8,
        ).collect()
    )
    assert got == want and len(got) == 2  # one span in each repeating doc

    # unknown action fails in prepare(), before any read
    with pytest.raises(ConfigError, match="unknown action"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "action": "typo", "source_location": corpus,
            "target_location": out,
        })).run()
    # min_occurrences=1 would delete the whole corpus — guarded
    with pytest.raises(ConfigError, match="min_occurrences"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "source_location": corpus, "min_occurrences": 1,
            "target_location": out,
        })).run()


@pytest.mark.slow
def test_incremental_decontaminate_two_batches_equal_scratch(spark, tmp_path):
    """The state composition's equivalence pin: batch1 then batch2
    with state_location unions to exactly the from-scratch scrub of
    the full corpus, and a re-run of an already-seen batch is a
    no-op (idempotent)."""
    from m3d_engine_spark.operators.suffix import exact_decontaminate

    bench = "m n o p q r s t"
    probe_loc = str(tmp_path / "probe")
    _write_docs(spark, probe_loc, [(9, f"q: {bench} a")])
    b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    _write_docs(spark, b1, [(1, f"pre {bench} post"), (2, "clean doc one")])
    _write_docs(spark, b2, [(3, f"{bench} leading"), (4, "clean doc two")])
    full = str(tmp_path / "full")
    spark.read.parquet(b1).unionByName(
        spark.read.parquet(b2)
    ).write.parquet(full)

    state = str(tmp_path / "state")
    outs = []
    for i, src in enumerate((b1, full)):
        # batch 2 arrives as the FULL corpus (the nightly shape: the
        # lake accretes); the state must pare it down to just b2's docs
        out = str(tmp_path / f"out{i}")
        outs.append(out)
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "source_location": src,
            "probe_location": probe_loc,
            "span_tokens": 8,
            "state_location": state,
            "target_location": out,
        })).run()
    got1 = spark.read.parquet(outs[0])
    got2 = spark.read.parquet(outs[1])
    assert sorted(r.doc_id for r in got2.collect()) == [3, 4]  # only new docs
    union = sorted(got1.unionByName(got2).collect())
    scratch = sorted(
        exact_decontaminate(
            spark.read.parquet(full), "doc_id", "text",
            spark.read.parquet(probe_loc), "doc_id", "text", span_tokens=8,
        ).collect()
    )
    assert union == scratch
    # idempotent: everything seen -> zero rows out, state unchanged
    out3 = str(tmp_path / "out3")
    REGISTRY["Decontaminate"](spark, ParamsFile({
        "source_location": full,
        "probe_location": probe_loc,
        "span_tokens": 8,
        "state_location": state,
        "target_location": out3,
    })).run()
    assert spark.read.parquet(out3).count() == 0
    assert sorted(
        r.doc_id for r in spark.read.parquet(state).collect()
    ) == [1, 2, 3, 4]


def test_incremental_state_not_updated_on_failed_write(spark, tmp_path):
    """State append happens strictly AFTER the output commit: a failed
    target write must leave the state absent so the batch retries in
    full."""
    b1 = str(tmp_path / "b1")
    _write_docs(spark, b1, [(1, "some text here")])
    probe_loc = str(tmp_path / "probe")
    _write_docs(spark, probe_loc, [(9, "other words")])
    blocker = tmp_path / "blocker"
    blocker.write_text("x")  # a FILE where the writer needs a dir
    state = str(tmp_path / "state")
    # match the WRITE failure specifically — a bare Exception would be
    # satisfied by any setup error and the test would pass vacuously
    with pytest.raises(Exception, match="(?i)parquet|path|directory|file"):
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "source_location": b1,
            "probe_location": probe_loc,
            "span_tokens": 2,
            "state_location": state,
            "target_location": str(blocker / "out"),
        })).run()
    assert not os.path.exists(state)


def test_state_dir_with_no_committed_parquet_treated_as_empty(
    spark, tmp_path, caplog
):
    """A first state append killed between directory creation and job
    commit leaves state_location existing with no readable parquet;
    the next run must treat it as EMPTY state (no batch was recorded)
    with a loud warning — not brick the nightly pipeline with an
    unreadable-schema error."""
    import logging

    b1 = str(tmp_path / "b1")
    _write_docs(spark, b1, [(1, "m n o p q r s t here")])
    probe_loc = str(tmp_path / "probe")
    _write_docs(spark, probe_loc, [(9, "m n o p q r s t")])
    state = tmp_path / "state"
    (state / "_temporary").mkdir(parents=True)  # the crashed-append shape
    out = str(tmp_path / "out")
    with caplog.at_level(logging.WARNING,
                         logger="m3d_engine_spark.operators.suffix"):
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "source_location": b1,
            "probe_location": probe_loc,
            "span_tokens": 8,
            "state_location": str(state),
            "target_location": out,
        })).run()
    assert any("no readable parquet" in r.message for r in caplog.records)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0].n_removed == 8  # scrubbed in full
    # and the run recorded the batch: state is now readable
    assert [r.doc_id for r in spark.read.parquet(str(state)).collect()] == [1]


def test_state_location_rejected_for_materialize(spark, tmp_path):
    with pytest.raises(ConfigError, match="state_location"):
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "materialize_probe_artifact": True,
            "probe_location": str(tmp_path / "p"),
            "state_location": str(tmp_path / "s"),
            "target_location": str(tmp_path / "t"),
        })).run()


def test_example_acons_parse_and_name_registered_algorithms():
    """EVERY shipped example acon parses and names only registered
    algorithms — including the algorithms inside Pipeline steps (a
    typo'd step would otherwise ship undetected while the inline
    composition test stays green)."""
    import glob

    import m3d_engine_spark.cli  # noqa: F401 — populates REGISTRY

    from m3d_engine_spark.operators.chain import _parse_steps

    ex_dir = os.path.join(os.path.dirname(__file__), "..", "examples")
    acons = sorted(glob.glob(os.path.join(ex_dir, "*.json")))
    assert len(acons) >= 20  # the sweep found the directory
    for path in acons:
        fn = os.path.basename(path)
        cfg = json.loads(open(path).read())
        # older acons are params-only (the algorithm name is the CLI
        # argv); newer ones document theirs inline — validate when
        # present
        if "algorithm" in cfg:
            assert cfg["algorithm"] in REGISTRY, fn
        if isinstance(cfg.get("steps"), list):
            # the Pipeline's own validator: names registered, step
            # structure legal (inline keys / params dict / params_file).
            # (SQLRunner's reference acon shape also uses a "steps" key
            # — an int statement COUNT — hence the list check.)
            _parse_steps(cfg["steps"])


@pytest.mark.slow
def test_nightly_ingest_pipeline_composition(spark, tmp_path):
    """The examples/nightly_ingest.json shape end-to-end, two nights:
    IncrementalDedup(batch) -> Decontaminate(incremental, artifact
    mode) -> ExactSubstrDedup(incremental span dedup) in ONE Pipeline
    run. Night 1 drops the accepted-corpus dup before the scrub ever
    sees it, scrubs the contaminated survivor, and records the
    batch's window counts; night 2 re-lands an already-scrubbed doc
    (the scrub state skips it) and lands a doc repeating a night-1
    span, which the window-count state removes WITHOUT re-reading
    night 1 (dedup artifacts are write-time relations of the ACCEPTED
    corpus — static across nights here, like a weekly
    re-materialize)."""
    import m3d_engine_spark.operators.incremental  # noqa: F401
    import m3d_engine_spark.operators.chain  # noqa: F401
    from m3d_engine_spark.operators.incremental import (
        materialize_dedup_artifacts,
    )
    from m3d_engine_spark.operators.suffix import probe_gram_artifact

    bench = "m n o p q r s t"
    corpus = spark.createDataFrame(
        [(100, "accepted corpus doc body that is already in the lake")],
        "doc_id int, text string",
    )
    arts = str(tmp_path / "arts")
    materialize_dedup_artifacts(corpus, "doc_id", "text", arts)
    probes = spark.createDataFrame([(9, bench)], "doc_id int, text string")
    probe_art = str(tmp_path / "probe_art")
    probe_gram_artifact(probes, "text", span_tokens=8).write.parquet(probe_art)
    (tmp_path / "probe_art" / "_meta.json").write_text(
        json.dumps({"kind": "probe_gram_artifact", "span_tokens": 8})
    )
    state = str(tmp_path / "state")
    wstate = str(tmp_path / "window_counts")

    def night(tag, rows):
        incoming = str(tmp_path / f"incoming_{tag}")
        _write_docs(spark, incoming, rows)
        staged = str(tmp_path / f"staged_{tag}")
        clean = str(tmp_path / f"clean_{tag}")
        final = str(tmp_path / f"final_{tag}")
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
                    "probe_artifact_location": probe_art,
                    "state_location": state,
                    "target_location": clean,
                }},
                {"algorithm": "ExactSubstrDedup", "params": {
                    "source_location": clean,
                    # the scrub's output carries the text as clean_text
                    "text_column": "clean_text",
                    "state_location": wstate,
                    "batch_tag": tag,
                    "span_tokens": 8,
                    "target_location": final,
                }},
            ],
        })).run()
        return final

    final1 = night("n1", [
        (1, "accepted corpus doc body that is already in the lake"),  # dup
        (2, f"fresh doc with {bench} contamination inside"),
        (3, "fresh clean doc carrying aa bb cc dd ee ff gg hh once"),
    ])
    got1 = {r.doc_id: r for r in spark.read.parquet(final1).collect()}
    assert set(got1) == {2, 3}  # the corpus dup never reached the scrub
    # step 3 reports removal over the step-2 CLEANED text: doc 2's
    # benchmark tokens are already gone, doc 3's span is corpus-unique
    # on night 1 and survives (count 1 recorded in the window state)
    assert got1[2].n_removed == 0 and got1[3].n_removed == 0
    assert "aa" in got1[3].clean_text

    # night 2 re-lands doc 3 (already scrubbed — the state skips it)
    # plus a doc repeating night 1's span: the window-count artifact
    # removes it without re-reading night 1
    final2 = night("n2", [
        (3, "fresh clean doc carrying aa bb cc dd ee ff gg hh once"),
        (4, "night two body aa bb cc dd ee ff gg hh trailing words"),
    ])
    got2 = {r.doc_id: r for r in spark.read.parquet(final2).collect()}
    assert set(got2) == {4}, got2  # 3 was skipped by the scrub state
    assert got2[4].n_removed == 8
    assert got2[4].clean_text == "night two body trailing words"
    # both nights' reports exist with one row per step
    for tag in ("n1", "n2"):
        rep = spark.read.parquet(str(tmp_path / f"report_{tag}"))
        assert rep.count() == 3


@pytest.mark.slow
def test_incremental_scrub_random_corpus_property(spark, tmp_path):
    """Seeded randomized pin (the test_properties idiom): on a random
    small-vocabulary corpus — adversarial overlaps, contaminated spans
    at doc edges, docs that are pure benchmark text, empty-ish docs —
    the union of two per-batch incremental scrubs equals the
    from-scratch scrub of the full corpus, row for row."""
    import random

    from m3d_engine_spark.operators.suffix import exact_decontaminate

    rng = random.Random(1414)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> heavy overlap

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))

    probes_rows = [(900 + i, doc()) for i in range(4)]
    docs = [(i, doc()) for i in range(40)]
    # plant exact probe text mid-doc, at edges, and as a whole doc
    p0 = probes_rows[0][1]
    docs[5] = (5, f"{p0} {doc()}")
    docs[6] = (6, f"{doc()} {p0}")
    docs[7] = (7, p0)
    split = rng.sample(range(40), 20)
    b1 = [d for d in docs if d[0] in split]
    b2_only = [d for d in docs if d[0] not in split]

    probe_loc = str(tmp_path / "probe")
    _write_docs(spark, probe_loc, probes_rows)
    b1_loc, full_loc = str(tmp_path / "b1"), str(tmp_path / "full")
    _write_docs(spark, b1_loc, b1)
    _write_docs(spark, full_loc, docs)

    state = str(tmp_path / "state")
    outs = []
    for i, src in enumerate((b1_loc, full_loc)):
        out = str(tmp_path / f"out{i}")
        outs.append(out)
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "source_location": src,
            "probe_location": probe_loc,
            "span_tokens": 4,
            "state_location": state,
            "target_location": out,
        })).run()
    union = sorted(
        spark.read.parquet(outs[0]).unionByName(
            spark.read.parquet(outs[1])
        ).collect()
    )
    scratch = sorted(
        exact_decontaminate(
            spark.read.parquet(full_loc), "doc_id", "text",
            spark.read.parquet(probe_loc), "doc_id", "text", span_tokens=4,
        ).collect()
    )
    assert union == scratch
    assert {r.doc_id for r in spark.read.parquet(outs[1]).collect()} == {
        d[0] for d in b2_only
    }
