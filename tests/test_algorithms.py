"""End-to-end algorithm runs (config-driven, golden-style)."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.base import REGISTRY
import m3d_engine_spark.cli  # noqa: F401 — populate REGISTRY

# Slow lane since round 8 (VERDICT r7 item 5 - default-lane budget):
# CLI end-to-end roundtrips runs once per session via `-m slow`; nothing deleted.
pytestmark = pytest.mark.slow


def _run(spark, name, params: dict):
    algo = REGISTRY[name](spark, ParamsFile(params))
    algo.run()
    return algo


def test_full_load_partitioned_location(spark, tmp_path, sf_dir):
    landing = str(tmp_path / "landing")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        # One order year: the test pins partitioned-write + date
        # derivation behavior, and 12 (year,month) output dirs exercise
        # that as well as ~80 do at a third of the filesystem cost.
        .filter(F.year("o_orderdate") == 1996)
        .limit(300)
        .withColumn("date", F.date_format("o_orderdate", "yyyyMMdd").cast("int"))
        .write.parquet(landing)
    )
    n_src = spark.read.parquet(landing).count()
    target = str(tmp_path / "lake")
    _run(
        spark,
        "FullLoad",
        {
            "source_dir": landing,
            "file_format": "parquet",
            "target_location": target,
            "target_partitions": ["year", "month"],
            "partition_column": "date",
            "partition_column_format": "yyyyMMdd",
            "output_files_num": 2,
        },
    )
    out = spark.read.parquet(target)
    assert out.count() == n_src and n_src > 0
    assert {"year", "month"} <= set(out.columns)


def test_append_load_regex_filename_partitions(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "data_20180422-00001.csv").write_text("1|a\n2|b\n")
    (landing / "data_20180423-00001.csv").write_text("3|c\n")
    target = str(tmp_path / "lake")
    _run(
        spark,
        "AppendLoad",
        {
            "source_dir": str(landing),
            "file_format": "dsv",
            "delimiter": "|",
            "schema": {
                "type": "struct",
                "fields": [
                    {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
                    {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                ],
            },
            "target_location": target,
            "target_partitions": ["year", "month", "day"],
            "regex_filename": [
                r"data_(\d{4})\d{4}-\d+",
                r"data_\d{4}(\d{2})\d{2}-\d+",
                r"data_\d{6}(\d{2})-\d+",
            ],
            "header_dir": str(tmp_path / "headers"),
        },
    )
    out = spark.read.parquet(target)
    rows = {r.k: (r.year, r.month, r.day) for r in out.collect()}
    assert rows[1] == (2018, 4, 22)
    assert rows[3] == (2018, 4, 23)
    # header.json persisted per partition
    assert (tmp_path / "headers" / "year=2018" / "month=4" / "day=22" / "header.json").exists()


def test_append_load_is_incremental(spark, tmp_path):
    landing1 = tmp_path / "l1"; landing1.mkdir()
    (landing1 / "data_20180422-0.csv").write_text("1|a\n")
    landing2 = tmp_path / "l2"; landing2.mkdir()
    (landing2 / "data_20180423-0.csv").write_text("2|b\n")
    target = str(tmp_path / "lake")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    params = {
        "file_format": "dsv",
        "delimiter": "|",
        "schema": schema,
        "target_location": target,
        "target_partitions": ["year", "month", "day"],
        "regex_filename": [
            r"data_(\d{4})\d{4}-\d+",
            r"data_\d{4}(\d{2})\d{2}-\d+",
            r"data_\d{6}(\d{2})-\d+",
        ],
    }
    _run(spark, "AppendLoad", {**params, "source_dir": str(landing1)})
    _run(spark, "AppendLoad", {**params, "source_dir": str(landing2)})
    out = spark.read.parquet(target)
    assert out.count() == 2  # both days present


def test_query_materialization(spark, tmp_path, sf_dir):
    src = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("year", F.year("o_orderdate"))
        .withColumn("month", F.month("o_orderdate"))
    )
    src.createOrReplaceTempView("orders_src")
    target = str(tmp_path / "mat")
    # seed the target with everything, then re-materialize one partition
    src.write.partitionBy("year", "month").parquet(target)
    _run(
        spark,
        "QueryMaterialization",
        {
            "source_table": "orders_src",
            "target_dir": target,
            "target_partitions": ["year", "month"],
            "partition_criteria": [[["year", 1995], ["month", 1]]],
        },
    )
    out = spark.read.parquet(target)
    expected = src.count()
    assert out.count() == expected


def test_range_materialization_criteria():
    from m3d_engine_spark.operators.materialization import date_range_criteria

    crits = date_range_criteria("2016-01-30", "2016-02-02", ["year", "month", "day"])
    assert [("year", 2016), ("month", 1), ("day", 30)] in crits
    assert len(crits) == 4
    months = date_range_criteria("2016-01-15", "2016-03-02", ["year", "month"])
    assert months == [
        [("year", 2016), ("month", 1)],
        [("year", 2016), ("month", 2)],
        [("year", 2016), ("month", 3)],
    ]
    weeks = date_range_criteria("2016-01-01", "2016-01-08", ["year", "week"])
    assert weeks == [[("year", 2016), ("week", 1)], [("year", 2016), ("week", 2)]]


def test_sql_runner_numbered_steps(spark):
    _run(
        spark,
        "SQLRunner",
        {
            "steps": 2,
            "0": "CREATE OR REPLACE TEMP VIEW sqlrunner_t AS SELECT 1 AS a",
            "1": "SELECT * FROM sqlrunner_t",
        },
    )
    assert spark.table("sqlrunner_t").count() == 1


def test_gzip_decompressor(spark, tmp_path):
    import gzip as gz
    import zipfile

    d = tmp_path / "landing"
    d.mkdir()
    with gz.open(d / "a.psv.gz", "wb") as fh:
        fh.write(b"1|x\n")
    with zipfile.ZipFile(d / "b.psv.zip", "w") as zf:
        zf.writestr("b.psv", "2|y\n")
    _run(spark, "GzipDecompressorBytes", {"directory": str(d), "thread_pool_size": 2})
    assert sorted(p.name for p in d.iterdir()) == ["a.psv", "b.psv"]
    assert (d / "a.psv").read_text() == "1|x\n"
    assert (d / "b.psv").read_text() == "2|y\n"


def test_delta_load_algorithm_partition_scoped(spark, tmp_path):
    active = spark.createDataFrame(
        [
            Row(salesorder=1, item=1, amount=100, year=2016),
            Row(salesorder=2, item=1, amount=200, year=2017),
        ]
    )
    active.createOrReplaceTempView("active_t")
    delta_dir = str(tmp_path / "delta")
    spark.createDataFrame(
        [Row(ts=1, salesorder=1, item=1, amount=101, recordmode="N", date=20160601)]
    ).write.parquet(delta_dir)
    target = str(tmp_path / "out")
    _run(
        spark,
        "DeltaLoad",
        {
            "delta_records_file_path": delta_dir,
            "active_records_table_lake": "active_t",
            "business_key": ["salesorder", "item"],
            "technical_key": ["ts"],
            "target_partitions": ["year"],
            "partition_column": "date",
            "partition_column_format": "yyyyMMdd",
            "target_location": target,
            "load_mode": "OverwritePartitionsWithAddedColumns",
        },
    )
    out = spark.read.parquet(target)
    rows = {(r.salesorder, r.item): r.amount for r in out.collect()}
    # only the affected partition (2016) was rewritten
    assert rows[(1, 1)] == 101


def test_curation_pipeline_cli_roundtrip(spark, tmp_path, sf_dir):
    """CurationPipeline through the params.json CLI dispatch: read a
    raw corpus, gate + scrub + dedup + split, write the CLEANED corpus
    (text included) partitioned by split — and the params file goes
    through JSON on disk, exactly as spark-submit would hand it over."""
    import subprocess
    import sys

    target = str(tmp_path / "cleaned")
    params = {
        "source_location": f"{sf_dir}/documents.parquet",
        "id_column": "doc_id",
        "text_column": "text",
        "min_tokens": 10,
        "scrub": True,
        "split_weights": [0.8, 0.1, 0.1],
        "target_location": target,
    }
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps(params))
    # In-process through the same loader the CLI uses (a subprocess
    # would pay a second JVM for no extra coverage; the CLI arg parsing
    # itself is exercised below with rc=2 on bad usage).
    from m3d_engine_spark.operators.base import run_algorithm

    run_algorithm(spark, "CurationPipeline", str(pfile))
    out = spark.read.parquet(target)
    assert set(out.columns) == {"doc_id", "split", "n_pii", "fp", "text"}
    n = out.count()
    assert n > 0
    # split partitioning is on disk (directory-level pruning)
    import os

    assert any(d.startswith("split=") for d in os.listdir(target))
    # dedup: fingerprints unique; survivors are each fp's min id
    assert out.select("fp").distinct().count() == n
    # equivalence with the library call (keep_text shape)
    from m3d_engine_spark.operators.curation import curation_pipeline

    lib = curation_pipeline(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        "doc_id", "text", min_tokens=10, keep_text=True,
    )
    assert {tuple(r) for r in lib.collect()} == {
        tuple(r) for r in out.select(*lib.columns).collect()
    }
    # CLI usage error path (no JVM spawned for rc=2)
    from m3d_engine_spark.cli import main as cli_main

    assert cli_main([]) == 2


def test_curation_pipeline_scrub_off(spark, sf_dir):
    """scrub=False: no PII pass — n_pii is 0 and text is untouched."""
    from m3d_engine_spark.operators.curation import curation_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curation_pipeline(
        docs, "doc_id", "text", min_tokens=10, scrub=False, keep_text=True
    )
    rows = out.collect()
    assert rows and all(r.n_pii == 0 for r in rows)
    raw = {r.doc_id: r.text for r in docs.collect()}
    assert all(raw[r.doc_id] == r.text for r in rows)


def test_fuzzy_dedup_cli_roundtrip(spark, tmp_path, sf_dir):
    """FuzzyDedup through the params.json dispatch: near-dedup the
    documents fixture, write the cleaned corpus, and match the library
    call exactly."""
    target = str(tmp_path / "deduped")
    pfile = tmp_path / "fd_params.json"
    pfile.write_text(json.dumps({
        "source_location": f"{sf_dir}/documents.parquet",
        "threshold": 0.5,
        "target_location": target,
    }))
    from m3d_engine_spark.operators.base import run_algorithm

    run_algorithm(spark, "FuzzyDedup", str(pfile))
    out = spark.read.parquet(target)
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert set(out.columns) == set(src.columns) | {"component", "cluster_size"}
    n = out.count()
    assert 0 < n <= src.count()
    from m3d_engine_spark.operators.fuzzy_dedup import fuzzy_dedup_corpus

    lib = fuzzy_dedup_corpus(src, "doc_id", "text", threshold=0.5)
    assert {tuple(r) for r in lib.select(*sorted(lib.columns)).collect()} == {
        tuple(r) for r in out.select(*sorted(lib.columns)).collect()
    }


def test_incremental_dedup_cli_two_actions(spark, tmp_path, sf_dir):
    """IncrementalDedup through the params dispatch: materialize the
    corpus artifacts, then run a batch against them — equal to the
    library composition."""
    from m3d_engine_spark.operators.base import run_algorithm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_loc = str(tmp_path / "corpus")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(corpus_loc)
    batch_loc = str(tmp_path / "batch")
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(batch_loc)
    art = str(tmp_path / "artifacts")
    target = str(tmp_path / "accepted")

    p1 = tmp_path / "mat.json"
    p1.write_text(json.dumps({
        "action": "materialize",
        "source_location": corpus_loc,
        "artifact_location": art,
    }))
    run_algorithm(spark, "IncrementalDedup", str(p1))
    import os

    assert os.path.isdir(f"{art}/bands") and os.path.exists(f"{art}/_meta.json")

    p2 = tmp_path / "batch.json"
    p2.write_text(json.dumps({
        "source_location": batch_loc,
        "artifact_location": art,
        "threshold": 0.5,
        "target_location": target,
    }))
    run_algorithm(spark, "IncrementalDedup", str(p2))
    out = spark.read.parquet(target)

    from m3d_engine_spark.operators.incremental import incremental_dedup

    lib = incremental_dedup(
        spark.read.parquet(batch_loc), spark.read.parquet(corpus_loc),
        "doc_id", "text", threshold=0.5,
    )
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in lib.collect()}
    assert out.count() > 0


def test_bm25_retrieval_cli_roundtrip(spark, tmp_path, sf_dir):
    """BM25Retrieval through the params dispatch == the library call."""
    from m3d_engine_spark.operators.base import run_algorithm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qloc = str(tmp_path / "queries")
    docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 5), " "
        ).alias("query_text"),
    ).write.parquet(qloc)
    target = str(tmp_path / "run")
    pfile = tmp_path / "bm25.json"
    pfile.write_text(json.dumps({
        "corpus_location": f"{sf_dir}/documents.parquet",
        "queries_location": qloc,
        "k": 5,
        "target_location": target,
    }))
    run_algorithm(spark, "BM25Retrieval", str(pfile))
    out = spark.read.parquet(target)

    from m3d_engine_spark.operators.retrieval import bm25_topk

    lib = bm25_topk(
        docs, "doc_id", "text", spark.read.parquet(qloc),
        "query_id", "query_text", k=5,
    )
    assert {tuple(r) for r in lib.collect()} == {
        tuple(r) for r in out.select(*lib.columns).collect()
    }


def test_scd2_history_cli_roundtrip(spark, tmp_path):
    """Scd2History through the params.json CLI dispatch equals the
    library call: a change stream condenses to versioned validity
    intervals and writes to the target location."""
    from m3d_engine_spark.operators.base import run_algorithm
    from m3d_engine_spark.operators.temporal import scd2_history

    src = str(tmp_path / "changes")
    rows = [
        (1, 10, "bronze"), (1, 20, "bronze"), (1, 30, "gold"),
        (2, 10, "silver"), (2, 40, "gold"), (2, 50, "silver"),
    ]
    df = spark.createDataFrame(rows, "cust long, ts long, tier string")
    df.write.mode("overwrite").parquet(src)

    target = str(tmp_path / "dim")
    params = {
        "source_location": src,
        "key_columns": ["cust"],
        "order_columns": ["ts"],
        "attr_columns": ["tier"],
        "target_location": target,
    }
    pfile = tmp_path / "scd_params.json"
    pfile.write_text(json.dumps(params))
    run_algorithm(spark, "Scd2History", str(pfile))

    got = sorted(tuple(r) for r in spark.read.parquet(target).collect())
    want = sorted(
        tuple(r) for r in scd2_history(df, ["cust"], ["ts"], ["tier"]).collect()
    )
    assert got == want
    assert len(got) == 5  # (1: bronze, gold) + (2: silver, gold, silver)


def test_expectations_check_cli_gate(spark, tmp_path):
    """ExpectationsCheck through the params CLI: writes the report,
    raises on violation when fail_on_violation (default), passes
    cleanly on a satisfied contract."""
    import pytest

    from m3d_engine_spark.operators.base import run_algorithm

    src = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, 7.0)], "id long, v double"
    ).write.parquet(src)

    report = str(tmp_path / "report")
    params = {
        "source_location": src,
        "rules": {"v_positive": "v > 0", "id_positive": "id > 0"},
        "target_location": report,
    }
    pfile = tmp_path / "exp_params.json"
    pfile.write_text(json.dumps(params))
    with pytest.raises(RuntimeError, match="v_positive"):
        run_algorithm(spark, "ExpectationsCheck", str(pfile))
    rep = {r.rule: r for r in spark.read.parquet(report).collect()}
    assert rep["v_positive"].passed == 0 and rep["v_positive"].n_violations == 1
    assert rep["id_positive"].passed == 1

    params["rules"] = {"v_bound": "v > -5"}
    pfile.write_text(json.dumps(params))
    run_algorithm(spark, "ExpectationsCheck", str(pfile))  # no raise
    assert all(r.passed == 1 for r in spark.read.parquet(report).collect())


def test_table_checksum_partition_and_order_independent(spark):
    """Same multiset of rows → same checksum under any partitioning or
    order; one changed row changes it; n_rows exact."""
    from m3d_engine_spark.operators.expectations import table_checksum

    rows = [(i, f"s{i % 7}") for i in range(500)]
    a = spark.createDataFrame(rows, "id long, s string")
    b = spark.createDataFrame(list(reversed(rows)), "id long, s string").repartition(13)
    ca = table_checksum(a).collect()[0]
    cb = table_checksum(b).collect()[0]
    assert (ca.n_rows, ca.checksum) == (cb.n_rows, cb.checksum)
    mut = spark.createDataFrame(
        rows[:-1] + [(499, "MUTATED")], "id long, s string"
    )
    cm = table_checksum(mut).collect()[0]
    assert cm.n_rows == ca.n_rows and cm.checksum != ca.checksum


def test_tokenizer_train_cli_roundtrip(spark, tmp_path, sf_dir):
    """TokenizerTrain through the params.json dispatch, both methods:
    bpe writes the ordered merge table equal to the library call;
    unigram writes the score table equal to the library call."""
    from m3d_engine_spark.operators.base import run_algorithm
    from m3d_engine_spark.operators.tokenizer import (
        bpe_train,
        unigram_lm_train,
    )

    src = f"{sf_dir}/documents.parquet"

    bpe_target = str(tmp_path / "merges")
    pfile = tmp_path / "params_bpe.json"
    pfile.write_text(json.dumps({
        "source_location": src,
        "text_column": "text",
        "method": "bpe",
        "num_merges": 6,
        "min_count": 2,
        "target_location": bpe_target,
    }))
    run_algorithm(spark, "TokenizerTrain", str(pfile))
    got = [
        (r.a, r.b)
        for r in spark.read.parquet(bpe_target).orderBy("idx").collect()
    ]
    df = spark.read.parquet(src)
    assert got == bpe_train(df, "text", num_merges=6, min_count=2)

    uni_target = str(tmp_path / "pieces")
    pfile2 = tmp_path / "params_uni.json"
    pfile2.write_text(json.dumps({
        "source_location": src,
        "text_column": "text",
        "method": "unigram",
        "n_iters": 1,
        "max_piece_len": 4,
        "min_count": 3,
        "seed_size": 256,
        "target_location": uni_target,
    }))
    run_algorithm(spark, "TokenizerTrain", str(pfile2))
    got_pieces = {
        (r.piece, round(r.logp, 10))
        for r in spark.read.parquet(uni_target).collect()
    }
    lib_pieces, _ = unigram_lm_train(
        df, "text", n_iters=1, max_piece_len=4, min_count=3, seed_size=256
    )
    assert got_pieces == {
        (r.piece, round(r.logp, 10)) for r in lib_pieces.collect()
    }
    assert len(got_pieces) > 0


def test_pipeline_steps_equal_sequential_runs(spark, tmp_path, sf_dir):
    """Pipeline: an ordered steps list of nested acon blocks runs
    exactly like the same algorithms dispatched one params file at a
    time (the reference's N-spark-submit production chain in ONE
    session)."""
    landing = str(tmp_path / "landing")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.year("o_orderdate") == 1996)
        .limit(200)
        .withColumn("date", F.date_format("o_orderdate", "yyyyMMdd").cast("int"))
        .write.parquet(landing)
    )
    load_params = {
        "source_dir": landing,
        "file_format": "parquet",
        "target_partitions": ["year", "month"],
        "partition_column": "date",
        "partition_column_format": "yyyyMMdd",
    }

    # sequential library calls
    seq_lake = str(tmp_path / "lake_seq")
    seq_mart = str(tmp_path / "mart_seq")
    _run(spark, "FullLoad", {**load_params, "target_location": seq_lake})
    spark.read.parquet(seq_lake).createOrReplaceTempView("pipeline_seq_lake")
    _run(spark, "QueryMaterialization", {
        "source_table": "pipeline_seq_lake",
        "target_dir": seq_mart,
        "target_partitions": ["year", "month"],
        "select_conditions": ["year=1996", "month=3"],
    })

    # one Pipeline params file (SQLRunner registers the intermediate view
    # so the chain is self-contained, like production acons)
    pipe_lake = str(tmp_path / "lake_pipe")
    pipe_mart = str(tmp_path / "mart_pipe")
    _run(spark, "Pipeline", {
        "steps": [
            {"algorithm": "FullLoad",
             "params": {**load_params, "target_location": pipe_lake}},
            {"algorithm": "SQLRunner", "params": {"statements": [
                "CREATE OR REPLACE TEMPORARY VIEW pipeline_pipe_lake "
                f"USING parquet OPTIONS (path '{pipe_lake}')"
            ]}},
            # inline-params form for the last step
            {"algorithm": "QueryMaterialization",
             "source_table": "pipeline_pipe_lake",
             "target_dir": pipe_mart,
             "target_partitions": ["year", "month"],
             "select_conditions": ["year=1996", "month=3"]},
        ]
    })

    a = spark.read.parquet(seq_mart)
    b = spark.read.parquet(pipe_mart).select(*a.columns)
    assert a.count() > 0
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_pipeline_validates_whole_chain_upfront(spark, tmp_path):
    """A typo in a LATER step must fail before step 1 mutates anything."""
    from m3d_engine_spark.config import ConfigError

    out = str(tmp_path / "never_written")
    src = str(tmp_path / "src")
    spark.range(3).write.parquet(src)
    with pytest.raises(ConfigError, match="unknown algorithm"):
        _run(spark, "Pipeline", {
            "steps": [
                {"algorithm": "FullLoad", "params": {
                    "source_dir": src, "file_format": "parquet",
                    "target_location": out}},
                {"algorithm": "NotAnAlgorithm", "params": {}},
            ]
        })
    import os
    assert not os.path.exists(out)
    with pytest.raises(ConfigError, match="non-empty 'steps'"):
        _run(spark, "Pipeline", {"steps": []})
    with pytest.raises(ConfigError, match="needs an 'algorithm' key"):
        _run(spark, "Pipeline", {"steps": [{"params": {}}]})


def test_pipeline_cli_params_file_roundtrip(spark, tmp_path, sf_dir):
    """Pipeline through the params.json CLI dispatch, the way
    spark-submit would run it."""
    from m3d_engine_spark.operators.base import run_algorithm

    src = str(tmp_path / "src")
    (
        spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    )
    lake = str(tmp_path / "lake")
    pfile = tmp_path / "pipeline_params.json"
    pfile.write_text(json.dumps({
        "steps": [
            {"algorithm": "FullLoad", "params": {
                "source_dir": src, "file_format": "parquet",
                "target_location": lake}},
        ]
    }))
    run_algorithm(spark, "Pipeline", str(pfile))
    assert spark.read.parquet(lake).count() == spark.read.parquet(src).count()


def test_pipeline_params_file_steps(spark, tmp_path, sf_dir):
    """Pipeline steps can reference external params files (the
    production acon layout); a missing file fails the whole chain
    before step 1 runs."""
    from m3d_engine_spark.config import ConfigError

    src = str(tmp_path / "src")
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.parquet(src)
    lake = str(tmp_path / "lake")
    step_file = tmp_path / "step1.json"
    step_file.write_text(json.dumps({
        "source_dir": src, "file_format": "parquet", "target_location": lake,
    }))
    _run(spark, "Pipeline", {"steps": [
        {"algorithm": "FullLoad", "params_file": str(step_file)},
    ]})
    assert spark.read.parquet(lake).count() == spark.read.parquet(src).count()

    out2 = str(tmp_path / "never")
    with pytest.raises(ConfigError, match="cannot load params_file"):
        _run(spark, "Pipeline", {"steps": [
            {"algorithm": "FullLoad", "params": {
                "source_dir": src, "file_format": "parquet",
                "target_location": out2}},
            {"algorithm": "FullLoad", "params_file": str(tmp_path / "nope.json")},
        ]})
    import os
    assert not os.path.exists(out2)


def test_pipeline_step_report_success(spark, tmp_path, sf_dir):
    """report_location: a per-step relation (step, algorithm, status,
    wall_seconds, error) lands as parquet — the chain-level sibling of
    ExpectationsCheck's report contract."""
    src = str(tmp_path / "src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    lake = str(tmp_path / "lake")
    report = str(tmp_path / "report")
    _run(spark, "Pipeline", {
        "report_location": report,
        "steps": [
            {"algorithm": "FullLoad", "params": {
                "source_dir": src, "file_format": "parquet",
                "target_location": lake}},
            {"algorithm": "SQLRunner", "params": {
                "statements": ["SELECT 1"]}},
        ],
    })
    rows = sorted(spark.read.parquet(report).collect(), key=lambda r: r.step)
    assert [(r.step, r.algorithm, r.status) for r in rows] == [
        (0, "FullLoad", "ok"), (1, "SQLRunner", "ok"),
    ]
    assert all(r.wall_seconds >= 0 and r.error is None for r in rows)
    assert rows[0].__fields__ == [
        "step", "algorithm", "status", "wall_seconds", "error",
    ]


def test_pipeline_step_report_on_failure(spark, tmp_path, sf_dir):
    """Fail-fast keeps its semantics AND the evidence: the failing
    step's row carries the error, later steps read 'skipped', and the
    report is on disk BEFORE the chain re-raises."""
    src = str(tmp_path / "src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    lake = str(tmp_path / "lake")
    report = str(tmp_path / "report")
    with pytest.raises(Exception, match="boom_missing_table"):
        _run(spark, "Pipeline", {
            "report_location": report,
            "steps": [
                {"algorithm": "FullLoad", "params": {
                    "source_dir": src, "file_format": "parquet",
                    "target_location": lake}},
                {"algorithm": "SQLRunner", "params": {
                    "statements": ["SELECT * FROM boom_missing_table"]}},
                {"algorithm": "SQLRunner", "params": {
                    "statements": ["SELECT 1"]}},
            ],
        })
    rows = sorted(spark.read.parquet(report).collect(), key=lambda r: r.step)
    assert [(r.step, r.status) for r in rows] == [
        (0, "ok"), (1, "failed"), (2, "skipped"),
    ]
    assert "boom_missing_table" in rows[1].error
    assert rows[2].wall_seconds is None and rows[2].error is None
    # step 1's effects are kept (N-spark-submit semantics)
    assert spark.read.parquet(lake).count() > 0


def test_pipeline_report_cli_roundtrip(spark, tmp_path, sf_dir):
    """report_location through the params.json CLI dispatch."""
    from m3d_engine_spark.operators.base import run_algorithm

    src = str(tmp_path / "src")
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.parquet(src)
    report = str(tmp_path / "report")
    pfile = tmp_path / "pipeline_params.json"
    pfile.write_text(json.dumps({
        "report_location": report,
        "steps": [
            {"algorithm": "FullLoad", "params": {
                "source_dir": src, "file_format": "parquet",
                "target_location": str(tmp_path / "lake")}},
        ],
    }))
    run_algorithm(spark, "Pipeline", str(pfile))
    rows = spark.read.parquet(report).collect()
    assert len(rows) == 1 and rows[0].status == "ok"


def test_pipeline_llm_curation_chain(spark, tmp_path, sf_dir):
    """A production-shaped LLM chain in ONE Pipeline params file:
    CurationPipeline (gate+scrub+split) → FuzzyDedup over the cleaned
    corpus → IncrementalDedup artifact materialization — the three
    curation CLIs composed fail-fast in one session, equal to the
    sequential dispatches."""
    cleaned = str(tmp_path / "cleaned")
    deduped = str(tmp_path / "deduped")
    art = str(tmp_path / "artifacts")
    _run(spark, "Pipeline", {"steps": [
        {"algorithm": "CurationPipeline", "params": {
            "source_location": f"{sf_dir}/documents.parquet",
            "id_column": "doc_id",
            "text_column": "text",
            "min_tokens": 10,
            "scrub": True,
            "split_weights": [0.8, 0.1, 0.1],
            "target_location": cleaned,
        }},
        {"algorithm": "FuzzyDedup", "params": {
            "source_location": cleaned,
            "threshold": 0.5,
            "target_location": deduped,
        }},
        {"algorithm": "IncrementalDedup", "params": {
            "action": "materialize",
            "source_location": deduped,
            "artifact_location": art,
        }},
    ]})
    import os

    n_clean = spark.read.parquet(cleaned).count()
    n_dedup = spark.read.parquet(deduped).count()
    assert 0 < n_dedup <= n_clean
    assert os.path.isdir(f"{art}/bands") and os.path.exists(f"{art}/_meta.json")

    # sequential dispatch of the same three steps matches exactly
    seq_clean = str(tmp_path / "s_cleaned")
    seq_dedup = str(tmp_path / "s_deduped")
    _run(spark, "CurationPipeline", {
        "source_location": f"{sf_dir}/documents.parquet",
        "id_column": "doc_id", "text_column": "text", "min_tokens": 10,
        "scrub": True, "split_weights": [0.8, 0.1, 0.1],
        "target_location": seq_clean,
    })
    _run(spark, "FuzzyDedup", {
        "source_location": seq_clean, "threshold": 0.5,
        "target_location": seq_dedup,
    })
    a = spark.read.parquet(deduped)
    b = spark.read.parquet(seq_dedup).select(*a.columns)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_decontaminate_cli_roundtrip(spark, tmp_path):
    """Decontaminate through the params.json CLI dispatch equals the
    library call; span_tokens JSON-boolean typo is rejected."""
    from m3d_engine_spark.operators.base import run_algorithm
    from m3d_engine_spark.operators.suffix import (
        _span_tokens_param,
        exact_decontaminate,
    )

    bench = "m n o p q r s t"
    train_rows = [(1, f"keep {bench} drop"), (2, "all clean here truly")]
    probe_rows = [(9, f"x {bench} y")]
    train_loc = str(tmp_path / "train")
    probe_loc = str(tmp_path / "probe")
    spark.createDataFrame(train_rows, "doc_id int, text string").write.parquet(
        train_loc
    )
    spark.createDataFrame(probe_rows, "doc_id int, text string").write.parquet(
        probe_loc
    )
    out = str(tmp_path / "scrubbed")
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps({
        "source_location": train_loc,
        "probe_location": probe_loc,
        "span_tokens": 8,
        "target_location": out,
    }))
    run_algorithm(spark, "Decontaminate", str(pfile))
    got = sorted(
        (r.doc_id, r.clean_text, r.n_removed)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.doc_id, r.clean_text, r.n_removed)
        for r in exact_decontaminate(
            spark.read.parquet(train_loc), "doc_id", "text",
            spark.read.parquet(probe_loc), "doc_id", "text", span_tokens=8,
        ).collect()
    )
    assert got == want and got[0] == (1, "keep drop", 8)

    from m3d_engine_spark.config import ConfigError, ParamsFile

    for bad in (True, False, 0, -3, 2.5, "eight"):
        with pytest.raises(ConfigError, match="span_tokens"):
            _span_tokens_param(ParamsFile({"span_tokens": bad}))
