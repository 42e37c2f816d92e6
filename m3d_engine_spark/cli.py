"""CLI entry point: ``python -m m3d_engine_spark <AlgorithmName> <params.json>``.

Reference parity: the spark-submit dispatch
``AlgorithmFactory <AlgorithmName> <params.json>``
(AlgorithmFactory.scala:16-83, README.md:64-75).
"""

from __future__ import annotations

import sys

from m3d_engine_spark.operators import (  # noqa: F401 — populate REGISTRY
    append_load,
    chain,
    curation,
    delta_lake_load,
    delta_load,
    expectations,
    fixed_size_extractor,
    full_load,
    fuzzy_dedup,
    incremental,
    gzip_decompressor,
    materialization,
    nested_flattener,
    retrieval,
    sql_runner,
    suffix,
    temporal,
    template,
    tokenizer,
    transpose,
)
from m3d_engine_spark.operators.base import REGISTRY, run_algorithm
from m3d_engine_spark.streaming import pipeline as _streaming  # noqa: F401 — registers StreamingAppendLoad
from m3d_engine_spark.session import build_session


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print(
            "usage: python -m m3d_engine_spark <AlgorithmName> <params.json>\n"
            f"algorithms: {', '.join(sorted(REGISTRY))}",
            file=sys.stderr,
        )
        return 2
    name, params_path = argv
    spark = build_session(app_name=f"m3d_engine_spark.{name}")
    try:
        run_algorithm(spark, name, params_path)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
