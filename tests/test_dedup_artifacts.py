"""Materialized corpus-side dedup artifacts: write-once, batch-join
equivalence with the from-scratch operator."""

from __future__ import annotations

import pytest

from m3d_engine_spark.operators.incremental import (
    incremental_dedup,
    incremental_dedup_against_artifacts,
    materialize_dedup_artifacts,
)

_BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)


@pytest.mark.slow
def test_artifact_path_equals_from_scratch(spark, tmp_path, sf_dir):
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    arts = materialize_dedup_artifacts(
        corpus, "doc_id", "text", str(tmp_path / "arts")
    )
    assert set(arts) == {"fingerprints", "bands", "shingles", "meta"}
    batch = spark.createDataFrame(
        [
            # exact dup of an existing doc (copy text from the corpus)
            (900001, corpus.orderBy("doc_id").first().text),
            (900002, _BASE),
            (900003, "an entirely novel document about nothing familiar"),
        ],
        "doc_id long, text string",
    )
    via_artifacts = {
        r.doc_id
        for r in incremental_dedup_against_artifacts(
            batch, arts, "doc_id", "text", threshold=0.5
        ).collect()
    }
    from_scratch = {
        r.doc_id
        for r in incremental_dedup(
            batch, corpus, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert via_artifacts == from_scratch
    assert 900001 not in via_artifacts  # the exact dup is gone
    assert 900003 in via_artifacts
    # artifacts are corpus-sized relations, not text: fingerprints are
    # 32-hex strings, bands are (id, band, band_key)
    fp = spark.read.parquet(arts["fingerprints"])
    assert fp.columns == ["_fp"]
    assert fp.count() <= corpus.count()
    bd = spark.read.parquet(arts["bands"])
    assert set(bd.columns) == {"doc_id", "band", "band_key"}
