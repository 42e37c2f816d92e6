"""End-to-end LLM training-data curation demo over the synthetic
testdata: quality gate → PII scrub → exact + fuzzy dedup →
decontamination → train/val/test split → token-budget packing →
epoch shuffle. Each stage is one of the engine's oracled operators;
run it with:

    python examples/llm_curation_demo.py [sf_dir]

Prints per-stage row counts. Everything is deterministic — rerunning
produces identical counts and identical splits.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from m3d_engine_spark.session import build_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(
        app_name="llm-curation-demo",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "false",
        },
    )
    from m3d_engine_spark.functions.redact import scrub_text
    from m3d_engine_spark.functions.text import quality_score, token_count
    from m3d_engine_spark.operators.decontamination import contamination_check
    from m3d_engine_spark.operators.fuzzy_dedup import fuzzy_dedup_corpus
    from m3d_engine_spark.operators.sampling import hash_split, pack_sequences
    from m3d_engine_spark.operators.shuffle import epoch_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"raw corpus:            {n0}")

    gated = docs.filter(quality_score(F.col("text")) >= 0.5)
    print(f"after quality gate:    {gated.count()}")

    scrubbed = gated.withColumn("text", scrub_text(F.col("text")))

    deduped = fuzzy_dedup_corpus(scrubbed, "doc_id", "text")
    print(f"after fuzzy dedup:     {deduped.count()}")

    # decontaminate against a probe set (here: a slice of the corpus
    # standing in for a benchmark)
    probes = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    hits = contamination_check(deduped, probes, "doc_id", "text")
    clean = deduped.join(
        hits.select("doc_id").distinct(), on="doc_id", how="left_anti"
    )
    print(f"after decontamination: {clean.count()}")

    split = hash_split(clean, "doc_id", [0.9, 0.05, 0.05])
    for r in split.groupBy("split").count().orderBy("split").collect():
        print(f"  split {r['split']}: {r['count']}")

    train = split.filter(F.col("split") == 0).withColumn("src", F.lit("all"))
    packed = pack_sequences(
        train, ["src"], "doc_id", token_count(F.col("text")), budget=512
    )
    print(f"training packs:        {packed.select('bin').distinct().count()}")

    order = epoch_shuffle(
        packed.select("doc_id"), "doc_id", epoch=0, num_shards=4
    )
    print(f"epoch-0 shards:        {order.select('shard').distinct().count()}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
