"""Regression tests for the round-10 ADVICE findings.

Pins: (1) the FuzzyDedup CLI dials ``max_bucket_size``/``salt_size``
distinguish 'unset' (None → dial disabled) from an explicit degenerate
value (0/negative → ValueError) — a config typo must not silently
disable the bucket cap that bounds the pair stream at scale;
(2) ``materialize_dedup_artifacts(bands_table=...)`` computes the LSH
band pipeline ONCE — the bucketed metastore copy is fed from the
parquet artifact just written, not by re-running the signature
pipeline over the corpus.
"""

import pytest

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.fuzzy_dedup import _positive_or_none


# ---------------------------------------------------------------- (1)
def test_fuzzy_dedup_dial_unset_disables():
    p = ParamsFile({})
    assert _positive_or_none(p, "max_bucket_size") is None
    assert _positive_or_none(p, "salt_size") is None


def test_fuzzy_dedup_dial_positive_passes_through():
    p = ParamsFile({"max_bucket_size": 200, "salt_size": "64"})
    assert _positive_or_none(p, "max_bucket_size") == 200
    assert _positive_or_none(p, "salt_size") == 64


@pytest.mark.parametrize("bad", [0, -1, "-5"])
def test_fuzzy_dedup_dial_degenerate_raises(bad):
    p = ParamsFile({"max_bucket_size": bad})
    with pytest.raises(ValueError, match="max_bucket_size"):
        _positive_or_none(p, "max_bucket_size")


# ---------------------------------------------------------------- (2)
def test_bucketed_bands_artifact_reads_parquet_not_lsh_replay(
    spark, tmp_path, sf_dir, monkeypatch
):
    """The bucketed-table copy of the band relation must source from
    the written parquet (one LSH pass total), not from the live
    band_rel plan (which would re-run minhash over the whole corpus).
    Pin by intercepting write_bucketed_table and asserting its input
    plan is a parquet scan of the bands path with no shuffle/expensive
    expression above it."""
    import m3d_engine_spark.sources.bucketing as bucketing
    from m3d_engine_spark.operators.incremental import (
        materialize_dedup_artifacts,
    )

    captured = {}
    real = bucketing.write_bucketed_table

    def spy(df, *a, **kw):
        captured["plan"] = df._jdf.queryExecution().optimizedPlan().toString()
        return real(df, *a, **kw)

    monkeypatch.setattr(bucketing, "write_bucketed_table", spy)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    base = str(tmp_path / "artifacts")
    table = "t_r11_bands_once"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        paths = materialize_dedup_artifacts(
            docs, "doc_id", "text", base, bands_table=table, num_buckets=4
        )
        plan = captured["plan"]
        # fed from the parquet artifact: the plan is a bare parquet
        # relation over (id, band, band_key), with none of the LSH
        # machinery (shingles/minhash aggregate) re-inlined above it
        assert "Relation" in plan and "parquet" in plan
        assert "band_key" in plan
        for marker in ("Aggregate", "Generate", "md5", "xxhash"):
            assert marker not in plan, (marker, plan)
        # and the bucketed table matches the parquet artifact exactly
        bucketed = spark.table(table)
        via_parquet = spark.read.parquet(paths["bands"])
        assert sorted(map(tuple, bucketed.collect())) == sorted(
            map(tuple, via_parquet.collect())
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
