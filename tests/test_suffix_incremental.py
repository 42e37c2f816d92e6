"""Incremental ExactSubstr (suffix.py::incremental_exact_substr + the
ExactSubstrDedup state_location CLI mode) and the initial_gram CLI
dial (round-15 build items)."""

import json
import os

import pytest

import m3d_engine_spark.operators.suffix  # noqa: F401 — populates REGISTRY
from m3d_engine_spark.config import ConfigError, ParamsFile
from m3d_engine_spark.operators.base import REGISTRY


ROWS = [
    (1, "a b c d e f g h tail one"),
    (2, "unique text here totally clean doc"),
    (3, "another clean document body words"),
    (4, "prefix a b c d e f g h more"),
    (5, "z y x w v u t s common suffix"),
    (6, "start z y x w v u t s end"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _out(df):
    return {r.doc_id: (r.clean_text, r.n_removed) for r in df.collect()}


def test_union_of_batches_equals_from_scratch(spark):
    """The equivalence contract at min_occurrences=2 (the Lee et al.
    setting): with id-monotone batches — the ingest convention — the
    union of incremental batch outputs is bit-identical to the
    from-scratch dedup of the whole corpus. Exercises both removal
    branches: a window straddling the batches (doc 1 kept, doc 4
    scrubbed via the state) and an intra-batch-2 repeat (doc 5 kept as
    the batch minimum, doc 6 scrubbed)."""
    from m3d_engine_spark.operators.suffix import (
        exact_substr_dedup,
        incremental_exact_substr,
    )

    b1, b2 = _df(spark, ROWS[:3]), _df(spark, ROWS[3:])
    c1, counts1 = incremental_exact_substr(
        b1, "doc_id", "text", None, span_tokens=8
    )
    c2, _ = incremental_exact_substr(
        b2, "doc_id", "text", counts1, span_tokens=8
    )
    inc = {**_out(c1), **_out(c2)}
    scratch = _out(
        exact_substr_dedup(_df(spark, ROWS), "doc_id", "text", span_tokens=8)
    )
    assert inc == scratch
    assert inc[4][1] == 8 and inc[6][1] == 8  # both branches removed


def test_counts_fold_across_batches_threshold_three(spark):
    """The artifact is ADDITIVE: a window seen once per batch crosses
    min_occurrences=3 only at batch 3, whose occurrence is removed;
    batches 1 and 2 keep theirs (forward-only — the accepted-corpus
    convention: already-emitted batches are never retroactively
    edited)."""
    from m3d_engine_spark.operators.suffix import incremental_exact_substr

    w = "p q r s t u v w"
    batches = [
        [(1, f"{w} first")],
        [(2, f"{w} second")],
        [(3, f"{w} third")],
    ]
    state, outs = None, []
    for rows in batches:
        clean, counts = incremental_exact_substr(
            _df(spark, rows), "doc_id", "text", state,
            span_tokens=8, min_occurrences=3,
        )
        outs.append(_out(clean))
        state = counts if state is None else state.unionByName(counts)
    assert outs[0][1][1] == 0 and outs[1][2][1] == 0
    assert outs[2][3] == ("third", 8)


def test_batch_counts_are_pre_removal(spark):
    """The returned (gh, cnt) contribution counts the ORIGINAL batch
    windows, not the survivors — folding contributions must reproduce
    from-scratch corpus counts (an intra-batch repeat contributes its
    full multiplicity)."""
    from m3d_engine_spark.operators.suffix import incremental_exact_substr

    rows = [(1, "a b c d e f g h x a b c d e f g h")]
    _, counts = incremental_exact_substr(
        _df(spark, rows), "doc_id", "text", None, span_tokens=8
    )
    by_cnt = {r.cnt for r in counts.collect()}
    assert 2 in by_cnt  # the repeated window counted twice


# ------------------------------------------------------- CLI lifecycle
def _run_cli(spark, tmp_path, rows, tag, extra=None):
    src = str(tmp_path / f"src_{tag}")
    out = str(tmp_path / f"out_{tag}")
    _df(spark, rows).write.mode("overwrite").parquet(src)
    params = {
        "source_location": src,
        "state_location": str(tmp_path / "state"),
        "batch_tag": tag,
        "span_tokens": 8,
        "target_location": out,
    }
    params.update(extra or {})
    REGISTRY["ExactSubstrDedup"](spark, ParamsFile(params)).run()
    return _out(spark.read.parquet(out))


@pytest.mark.slow
def test_cli_two_batches_and_retry_idempotency(spark, tmp_path):
    """The acon lifecycle: batch outputs match the library contract,
    the state dir holds one batch_tag partition per night with
    summable counts, and a FULL re-run of an already-recorded batch
    (retry after both commits) reproduces its output bit-for-bit —
    the own-tag exclusion on the state read."""
    from m3d_engine_spark.operators.suffix import exact_substr_dedup

    o1 = _run_cli(spark, tmp_path, ROWS[:3], "n1")
    o2 = _run_cli(spark, tmp_path, ROWS[3:], "n2")
    scratch = _out(
        exact_substr_dedup(_df(spark, ROWS), "doc_id", "text", span_tokens=8)
    )
    assert {**o1, **o2} == scratch

    st = spark.read.parquet(str(tmp_path / "state"))
    tags = {str(r.batch_tag) for r in st.select("batch_tag").distinct().collect()}
    assert tags == {"n1", "n2"}

    # retry: same batch, same tag — output identical, counts not doubled
    before = st.count()
    o2b = _run_cli(spark, tmp_path, ROWS[3:], "n2")
    assert o2b == o2
    assert spark.read.parquet(str(tmp_path / "state")).count() == before


def test_cli_incremental_mode_validation(spark, tmp_path):
    """state_location needs batch_tag (and vice versa), applies to
    action='dedup' only, and append load modes are rejected with the
    retry-safety contract — all in prepare(), before any read (the
    source paths here do not exist)."""
    base = {
        "source_location": str(tmp_path / "never"),
        "target_location": str(tmp_path / "never_out"),
    }
    for bad, msg in [
        ({"state_location": "s"}, "BOTH state_location"),
        ({"batch_tag": "t"}, "BOTH state_location"),
        (
            {"state_location": "s", "batch_tag": "t", "action": "spans"},
            "action='dedup' only",
        ),
        (
            {
                "state_location": "s",
                "batch_tag": "t",
                "load_mode": "AppendUnionPartitions",
            },
            "retry-safe",
        ),
    ]:
        with pytest.raises(ConfigError, match=msg):
            REGISTRY["ExactSubstrDedup"](
                spark, ParamsFile({**base, **bad})
            ).run()


def test_cli_state_write_after_output_commit(spark, tmp_path):
    """A failed output write must leave the batch UNRECORDED in the
    artifact (the retry then scrubs it in full) — state strictly after
    the output commit, the shared incremental contract."""
    src = str(tmp_path / "src")
    _df(spark, ROWS[:3]).write.parquet(src)
    state = str(tmp_path / "state")
    with pytest.raises(Exception):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "source_location": src,
            "state_location": state,
            "batch_tag": "n1",
            # unwritable target -> output commit fails
            "target_location": "/proc/invalid/target",
        })).run()
    assert not os.path.exists(state)


# ------------------------------------------------- initial_gram dial
def test_initial_gram_param_roundtrip_and_identical_output(
    spark, tmp_path
):
    """The doubling-seed width is a params dial on both cascade CLIs
    (round-15 item): a non-default g0 must produce IDENTICAL output —
    the seed only re-shapes the cascade, never the equality classes —
    and the shared integer guard rejects garbage."""
    src = str(tmp_path / "src")
    _df(spark, ROWS).write.parquet(src)

    def run_dedup(g0, out):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "source_location": src,
            "span_tokens": 8,
            "initial_gram": g0,
            "target_location": str(tmp_path / out),
        })).run()
        return _out(spark.read.parquet(str(tmp_path / out)))

    assert run_dedup(2, "g2") == run_dedup(8, "g8")

    with pytest.raises(ConfigError, match="initial_gram"):
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "source_location": src,
            "initial_gram": True,
            "target_location": str(tmp_path / "never"),
        })).run()


@pytest.mark.slow
def test_initial_gram_on_decontaminate_exact_mode(spark, tmp_path):
    """Same dial on the Decontaminate cascade path: non-default g0,
    identical scrub."""
    train, probes = str(tmp_path / "train"), str(tmp_path / "probes")
    _df(spark, ROWS[:4]).write.parquet(train)
    spark.createDataFrame(
        [(9, "a b c d e f g h")], "doc_id int, text string"
    ).write.parquet(probes)

    def run(g0, out):
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "source_location": train,
            "probe_location": probes,
            "span_tokens": 8,
            "initial_gram": g0,
            "target_location": str(tmp_path / out),
        })).run()
        return _out(spark.read.parquet(str(tmp_path / out)))

    a, b = run(1, "d_g1"), run(8, "d_g8")
    assert a == b
    assert a[1][1] == 8 and a[4][1] == 8  # probe window scrubbed


@pytest.mark.slow
def test_suffix_classes_identical_across_seeds(spark):
    """Library-level pin of the same invariant: suffix_window_classes
    partitions positions identically at every seed width (class NAMES
    are seed-independent too — min (doc,pos) of the window text)."""
    from m3d_engine_spark.functions.text import tokens
    from m3d_engine_spark.operators.suffix import suffix_window_classes
    from pyspark.sql import functions as F

    base = _df(spark, ROWS).select(
        F.col("doc_id"), tokens(F.col("text")).alias("_tk")
    )
    for L in (3, 5, 8):
        ref = None
        for g0 in (1, 2, 4, 8, 16):
            rel = {
                (r.doc_id, r._pos, (r._cls._cd, r._cls._cp))
                for r in suffix_window_classes(
                    base, "doc_id", L, initial_gram=g0
                ).collect()
            }
            if ref is None:
                ref = rel
            assert rel == ref, f"seed {g0} diverged at L={L}"


# ------------------------------------------- state compaction dial
@pytest.mark.slow
def test_compact_state_over_files_window_counts(spark, tmp_path):
    """compact_state_over_files on the window-count state: after two
    nights exceed the dial, the state is rewritten with FEWER data
    files, identical folded counts, batch_tag partitioning preserved
    (own-tag retry exclusion survives), the next batch behaves
    exactly as without compaction, and no temp/backup litter
    remains."""
    from m3d_engine_spark.sources.dfs import DFS

    state = str(tmp_path / "state")

    def fold(loc):
        return {
            (r.gh, str(r.batch_tag)): r.cnt
            for r in spark.read.parquet(loc).collect()
        }

    _run_cli(spark, tmp_path, ROWS[:3], "n1",
             extra={"compact_state_over_files": 1})
    pre = fold(state)

    def data_files():
        return [
            f for f in DFS(spark).list_files(state)
            if not f.rsplit("/", 1)[-1].startswith(("_", "."))
        ]

    n_before = len(data_files())
    o2 = _run_cli(spark, tmp_path, ROWS[3:], "n2",
                  extra={"compact_state_over_files": 1})
    # night 2 wrote its contribution AND compacted (files > 1)
    assert len(data_files()) <= n_before + 1
    post = fold(state)
    assert {k for k in post if k[1] == "n1"} == set(pre)
    assert all(post[k] == pre[k] for k in pre)
    assert {k[1] for k in post} == {"n1", "n2"}
    # no temp/backup litter from the atomic rewrite
    litter = [
        f for f in DFS(spark).list_files(str(tmp_path))
        if "_tmp" in f or "backup" in f.lower()
    ]
    assert not litter, litter

    # night 3 on the compacted state: same semantics as uncompacted —
    # doc 7 repeats night 2's span and is scrubbed via the fold
    o3 = _run_cli(
        spark, tmp_path, [(7, "closing z y x w v u t s echo")], "n3",
        extra={"compact_state_over_files": 100},
    )
    assert o3[7] == ("closing echo", 8)
    assert o2[5][1] == 0  # night-2 canonical stayed intact


@pytest.mark.slow
def test_compact_state_over_files_scrubbed_ids(spark, tmp_path):
    """Same dial on the Decontaminate scrubbed-ids state (flat
    layout): compaction keeps the id set intact and the next night
    still anti-joins already-scrubbed docs out."""
    from m3d_engine_spark.sources.dfs import DFS

    probes = str(tmp_path / "probes")
    spark.createDataFrame(
        [(9, "m n o p q r s t")], "doc_id int, text string"
    ).write.parquet(probes)
    state = str(tmp_path / "state")

    def night(rows, tag):
        src = str(tmp_path / f"src_{tag}")
        out = str(tmp_path / f"out_{tag}")
        _df(spark, rows).write.parquet(src)
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "source_location": src,
            "probe_location": probes,
            "span_tokens": 8,
            "state_location": state,
            "compact_state_over_files": 1,
            "target_location": out,
        })).run()
        return _out(spark.read.parquet(out))

    night([(1, "pre m n o p q r s t post"), (2, "clean body")], "n1")
    ids_pre = sorted(r.doc_id for r in spark.read.parquet(state).collect())
    assert ids_pre == [1, 2]
    out2 = night([(2, "clean body"), (3, "also m n o p q r s t here")], "n2")
    assert sorted(out2) == [3]  # doc 2 skipped via the compacted state
    ids_post = sorted(r.doc_id for r in spark.read.parquet(state).collect())
    assert ids_post == [1, 2, 3]
    files = [
        f for f in DFS(spark).list_files(state)
        if not f.rsplit("/", 1)[-1].startswith(("_", "."))
    ]
    assert len(files) <= 2, files  # compacted, not accreting


# --------------------------------------- round-15 review-pass fixes
@pytest.mark.slow
def test_decontaminate_tagged_state_rerun_after_success(spark, tmp_path):
    """The data-destruction hazard of the flat layout, fixed by the
    tagged one: a FULL re-run of an already recorded Decontaminate
    batch (orchestrator replay after success) must reproduce the
    night's output bit-for-bit — with the flat append state it would
    anti-join its own ids out and overwrite the output with an empty
    frame."""
    probes = str(tmp_path / "probes")
    spark.createDataFrame(
        [(9, "m n o p q r s t")], "doc_id int, text string"
    ).write.parquet(probes)
    state = str(tmp_path / "state")

    def night(rows, tag, out_name):
        src = str(tmp_path / f"src_{tag}_{out_name}")
        out = str(tmp_path / out_name)
        _df(spark, rows).write.mode("overwrite").parquet(src)
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "source_location": src,
            "probe_location": probes,
            "span_tokens": 8,
            "state_location": state,
            "batch_tag": tag,
            "target_location": out,
        })).run()
        return _out(spark.read.parquet(out))

    rows1 = [(1, "pre m n o p q r s t post"), (2, "clean body")]
    o1 = night(rows1, "2026-08-15", "out1")
    assert o1[1][1] == 8 and o1[2][1] == 0
    # replay after success: output identical, NOT empty
    o1b = night(rows1, "2026-08-15", "out1b")
    assert o1b == o1
    # night 2 still skips night 1's docs through the tagged state
    o2 = night(
        [(2, "clean body"), (3, "new m n o p q r s t doc")],
        "2026-08-16", "out2",
    )
    assert sorted(o2) == [3] and o2[3][1] == 8


def test_batch_tag_charset_validation(spark, tmp_path):
    """Tags become literal partition dir names compared byte-exactly —
    characters the filesystem layer escapes are rejected up front, on
    both CLIs, before any read."""
    for algo, params in [
        ("ExactSubstrDedup", {"state_location": "s", "batch_tag": "a:b"}),
        ("Decontaminate", {
            "probe_location": "p", "state_location": "s",
            "batch_tag": "x%41y",
        }),
    ]:
        with pytest.raises(ConfigError, match="batch_tag"):
            REGISTRY[algo](spark, ParamsFile({
                "source_location": str(tmp_path / "never"),
                "target_location": str(tmp_path / "never_out"),
                **params,
            })).run()
    with pytest.raises(ConfigError, match="batch_tag"):
        # tag without a state dir is meaningless on Decontaminate
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "source_location": str(tmp_path / "never"),
            "probe_location": str(tmp_path / "never_p"),
            "batch_tag": "2026-08-16",
            "target_location": str(tmp_path / "never_out"),
        })).run()


@pytest.mark.slow
def test_numeric_tag_rerun_survives_compaction(spark, tmp_path):
    """'01' would round-trip to 1 under partition-type inference; the
    dir-name read path and the inference-off compaction keep the tag
    byte-identical, so a re-run after a compaction that folded the
    state layout still excludes its own counts."""
    _run_cli(spark, tmp_path, ROWS[:3], "01")
    o2 = _run_cli(spark, tmp_path, ROWS[3:], "02",
                  extra={"compact_state_over_files": 1})
    from m3d_engine_spark.sources.dfs import DFS

    names = DFS(spark).list_dirs(str(tmp_path / "state"))
    assert sorted(names) == ["batch_tag=01", "batch_tag=02"], names
    o2b = _run_cli(spark, tmp_path, ROWS[3:], "02")
    assert o2b == o2  # own-tag exclusion intact after compaction


def test_compaction_floor_stops_perpetual_rewrites(spark, tmp_path):
    """Compaction is per LEAF dir: tag dirs at or under the dial (or
    already at their byte-planned layout) are left byte-identical —
    more tags than N must never trigger a futile whole-state rewrite.
    Only the over-N dir is rewritten, and _temporary litter below the
    root never counts toward any dir's trigger."""
    from m3d_engine_spark.operators.suffix import _maybe_compact_state
    from m3d_engine_spark.sources.dfs import DFS

    state = tmp_path / "state"
    for tag in ("n1", "n2", "n3"):
        spark.createDataFrame(
            [(f"h{tag}", 1)], "gh string, cnt long"
        ).coalesce(1).write.parquet(str(state / f"batch_tag={tag}"))
    # one over-dial dir (4 files) that SHOULD compact
    spark.createDataFrame(
        [(f"x{i}", 1) for i in range(8)], "gh string, cnt long"
    ).repartition(4).write.parquet(str(state / "batch_tag=n5"))
    # crashed-write litter that must not count
    lit = state / "batch_tag=n4" / "_temporary" / "0"
    lit.mkdir(parents=True)
    (lit / "part-00000").write_text("junk")

    def files_in(tag):
        return sorted(
            rel for rel, _ in DFS(spark).committed_files(str(state))
            if rel.startswith(f"batch_tag={tag}/")
        )

    small_before = {t: files_in(t) for t in ("n1", "n2", "n3")}
    assert len(files_in("n5")) == 4
    _maybe_compact_state(
        spark, ParamsFile({"compact_state_over_files": 3}), str(state)
    )
    # the three at-dial dirs are byte-untouched; the over-dial dir
    # compacted to its planned (tiny -> 1) file count with rows intact
    assert {t: files_in(t) for t in ("n1", "n2", "n3")} == small_before
    assert len(files_in("n5")) == 1
    n5 = spark.read.parquet(str(state / "batch_tag=n5")).collect()
    assert sorted(r.gh for r in n5) == [f"x{i}" for i in range(8)]


def test_mixed_flat_and_tagged_state_rejected(spark, tmp_path):
    """Adding batch_tag to a deployment with an existing FLAT state
    (the pre-r15 example shape) must fail loudly: silently ignoring
    the flat files would forget every previously recorded id and
    re-emit re-appearing docs with no signal."""
    probes = str(tmp_path / "probes")
    spark.createDataFrame(
        [(9, "m n o p q r s t")], "doc_id int, text string"
    ).write.parquet(probes)
    state = str(tmp_path / "state")
    # legacy flat state: ids at the root
    spark.createDataFrame([(1,), (2,)], "doc_id int").write.parquet(state)
    src = str(tmp_path / "src")
    _df(spark, ROWS[:2]).write.parquet(src)
    with pytest.raises(ConfigError, match="flat"):
        REGISTRY["Decontaminate"](spark, ParamsFile({
            "source_location": src,
            "probe_location": probes,
            "span_tokens": 8,
            "state_location": state,
            "batch_tag": "2026-08-16",
            "target_location": str(tmp_path / "out"),
        })).run()


@pytest.mark.slow
def test_incremental_exact_substr_random_corpus_property(spark, tmp_path):
    """Seeded randomized equivalence pin (the test_properties idiom):
    on a tiny-vocabulary random corpus — heavy window overlap, planted
    cross-batch repeats, whole-doc repeats, sub-window-length docs —
    the union of three id-monotone incremental batches (through the
    CLI, tagged state and all) equals the from-scratch
    exact_substr_dedup of the full corpus, row for row, at
    min_occurrences=2."""
    import random

    from m3d_engine_spark.operators.suffix import exact_substr_dedup

    rng = random.Random(2718)
    vocab = [f"w{i}" for i in range(10)]  # tiny vocab -> heavy overlap

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 24)))

    docs = [(i, doc()) for i in range(45)]
    # planted structure: a whole-doc repeat across batches, a shared
    # span at doc edges, and a short sub-window doc
    docs[3] = (3, docs[2][1])                         # intra-batch whole dup
    span = " ".join(rng.choice(vocab) for _ in range(6))
    docs[7] = (7, f"{span} {doc()}")                  # batch 1 edge
    docs[20] = (20, f"{doc()} {span}")                # batch 2 edge
    docs[40] = (40, span)                             # batch 3 whole doc
    docs[41] = (41, "w0 w1")                          # shorter than a window
    # id-monotone batches (the ingest convention the equivalence needs)
    batches = [docs[:15], docs[15:30], docs[30:]]

    state = str(tmp_path / "state")
    union = {}
    for k, rows in enumerate(batches):
        src = str(tmp_path / f"src{k}")
        out = str(tmp_path / f"out{k}")
        _df(spark, rows).write.parquet(src)
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "source_location": src,
            "state_location": state,
            "batch_tag": f"night-{k}",
            "span_tokens": 4,
            "target_location": out,
        })).run()
        union.update(_out(spark.read.parquet(out)))
    scratch = _out(
        exact_substr_dedup(_df(spark, docs), "doc_id", "text", span_tokens=4)
    )
    assert union == scratch
    # the planted cross-batch repeats actually removed
    assert union[20][1] >= 4 and union[40][1] >= 4


@pytest.mark.slow
def test_compaction_swap_litter_recovery_and_read_guard(spark, tmp_path):
    """A per-leaf compaction swaps through batch_tag=<tag>__tmp_*/
    __bak_* siblings INSIDE the state root. Crash shapes: a stale
    __tmp_ or a __bak_ with the base present are dropped by the next
    compaction run; a __bak_ whose base is GONE holds that batch's
    only data — the read path refuses to proceed (losing the batch
    silently would bypass the retry exclusion), and the compaction
    startup RESTORES it."""
    from m3d_engine_spark.operators.suffix import (
        _maybe_compact_state,
        committed_tag_dirs,
    )
    from m3d_engine_spark.sources.dfs import DFS

    state = tmp_path / "state"

    def write_tag(tag, rows):
        spark.createDataFrame(rows, "gh string, cnt long").coalesce(
            1
        ).write.parquet(str(state / f"batch_tag={tag}"))

    write_tag("n1", [("h1", 1)])
    write_tag("n2", [("h2", 2)])
    # crash shape (c): n2's base renamed away mid-swap — only the
    # backup holds its data
    import os

    os.rename(str(state / "batch_tag=n2"),
              str(state / "batch_tag=n2__bak_deadbeef1234"))
    # crash shape (a): an uncommitted rewrite of n1
    write_tag("n1__tmp_cafecafe1234", [("junk", 9)])

    # read path: refuses while n2's only data sits in the orphan backup
    with pytest.raises(ConfigError, match="orphan compaction backup"):
        committed_tag_dirs(spark, str(state), "n3")

    # compaction startup recovers: n2 restored, litter gone
    _maybe_compact_state(
        spark, ParamsFile({"compact_state_over_files": 100}), str(state)
    )
    names = sorted(DFS(spark).list_dirs(str(state)))
    assert names == ["batch_tag=n1", "batch_tag=n2"], names
    dirs = committed_tag_dirs(spark, str(state), "n3")
    got = {r.gh: r.cnt for r in spark.read.parquet(*dirs).collect()}
    assert got == {"h1": 1, "h2": 2}

    # crash shape (b): backup left behind with the base present —
    # stale; the read skips it, the next compaction drops it
    write_tag("n1__bak_0123456789ab", [("stale", 9)])
    dirs = committed_tag_dirs(spark, str(state), "n3")
    got = {r.gh: r.cnt for r in spark.read.parquet(*dirs).collect()}
    assert got == {"h1": 1, "h2": 2}  # stale backup invisible
    _maybe_compact_state(
        spark, ParamsFile({"compact_state_over_files": 100}), str(state)
    )
    assert sorted(DFS(spark).list_dirs(str(state))) == [
        "batch_tag=n1", "batch_tag=n2",
    ]

    # unrelated parked subdir: ignored, never misdiagnosed as flat
    write_tag("../state/backup_copy", [("x", 1)]) if False else None
    spark.createDataFrame([("x", 1)], "gh string, cnt long").write.parquet(
        str(state / "parked")
    )
    dirs = committed_tag_dirs(spark, str(state), "n3")
    assert len(dirs) == 2


@pytest.mark.slow
def test_fold_state_action(spark, tmp_path):
    """action='fold_state': the acon twin of
    materialize_window_count_table — validates its param combos, folds
    the tag dirs into a gh-bucketed table with summed counts, and the
    folded relation drives the same scrub decisions as the raw tag
    dirs."""
    from conftest import drop_table_clean

    from m3d_engine_spark.operators.suffix import incremental_exact_substr

    _run_cli(spark, tmp_path, ROWS[:3], "n1")
    _run_cli(spark, tmp_path, ROWS[3:], "n2")
    state = str(tmp_path / "state")

    drop_table_clean(spark, "r15_wc_fold")
    try:
        with pytest.raises(ConfigError, match="fold_state needs"):
            REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
                "action": "fold_state", "state_location": state,
            })).run()
        with pytest.raises(ConfigError, match="does not apply"):
            REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
                "action": "fold_state", "state_location": state,
                "state_table": "r15_wc_fold", "batch_tag": "n3",
            })).run()
        REGISTRY["ExactSubstrDedup"](spark, ParamsFile({
            "action": "fold_state",
            "state_location": state,
            "state_table": "r15_wc_fold",
            "state_buckets": 4,
        })).run()
        folded = {
            r.gh: r.cnt for r in spark.table("r15_wc_fold").collect()
        }
        raw = spark.read.parquet(
            *(f"{state}/batch_tag={t}" for t in ("n1", "n2"))
        )
        want = {
            r.gh: r.cnt
            for r in raw.groupBy("gh").sum("cnt")
            .withColumnRenamed("sum(cnt)", "cnt").collect()
        }
        assert folded == want and folded
        # the folded table drives the same removals as the tag dirs
        batch3 = _df(spark, [(7, "closing z y x w v u t s echo")])
        c_tab, _ = incremental_exact_substr(
            batch3, "doc_id", "text", spark.table("r15_wc_fold"),
            span_tokens=8,
        )
        c_raw, _ = incremental_exact_substr(
            batch3, "doc_id", "text", raw.select("gh", "cnt"),
            span_tokens=8,
        )
        assert _out(c_tab) == _out(c_raw) == {7: ("closing echo", 8)}
    finally:
        spark.sql("DROP TABLE IF EXISTS r15_wc_fold")
