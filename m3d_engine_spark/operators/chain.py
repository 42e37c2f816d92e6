"""Multi-step params pipeline: one params file, N algorithms in order.

The reference's acon surface dispatches exactly ONE algorithm per params
file (AlgorithmFactory.scala:16-83); production chains — load → curate →
dedup → materialize — are orchestrated outside the engine (N
spark-submits). ``Pipeline`` is the algorithm-level sibling of
SQLRunner's ordered statements (SQLRunner.scala:8-19): an ordered
``steps`` list of nested acon blocks, each a full params file for a
registered algorithm, run sequentially in ONE session.

Semantics match N sequential spark-submits exactly: fail-fast (a step
failure stops the chain; completed steps keep their effects — each
step's own atomic-swap/restore machinery still governs its safety), no
implicit state passed between steps (steps communicate through tables /
locations, like separate jobs do). Running in one session is the scale
win: the JVM, executors and parquet footer caches warm once instead of
per step, and a shared AQE-enabled session reuses shuffle statistics
across the chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from m3d_engine_spark.config import ConfigError, ParamsFile
from m3d_engine_spark.operators.base import REGISTRY, Algorithm, register


def _parse_steps(raw: list) -> list[tuple[str, dict]]:
    """Validate the chain's SHAPE upfront — algorithm names, step
    structure, and params files parse — so a typo'd name or a missing
    acon file in step 3 fails before step 1 mutates anything. Step
    params CONTENTS are validated by each algorithm at its turn, so a
    semantically bad step 2 still fails mid-chain with step 1's effects
    kept: exactly the semantics of N sequential spark-submits."""
    if not isinstance(raw, list) or not raw:
        raise ConfigError("Pipeline needs a non-empty 'steps' list")
    steps: list[tuple[str, dict]] = []
    for i, step in enumerate(raw):
        if not isinstance(step, dict) or "algorithm" not in step:
            raise ConfigError(
                f"Pipeline step {i}: each step needs an 'algorithm' key"
            )
        name = step["algorithm"]
        if name not in REGISTRY:
            raise ConfigError(
                f"Pipeline step {i}: unknown algorithm {name!r}; "
                f"known: {sorted(REGISTRY)}"
            )
        if "params_file" in step:
            # production acons live as separate files
            path = step["params_file"]
            try:
                params = ParamsFile.load(path).params
            except ConfigError:
                raise
            except Exception as e:
                raise ConfigError(
                    f"Pipeline step {i}: cannot load params_file {path!r}: {e}"
                ) from e
        else:
            params = step.get("params")
            if params is None:
                # inline form: the step block IS the params file
                params = {k: v for k, v in step.items() if k != "algorithm"}
        if not isinstance(params, dict):
            raise ConfigError(f"Pipeline step {i}: 'params' must be an object")
        steps.append((name, params))
    return steps


REPORT_SCHEMA = (
    "step int, algorithm string, status string, wall_seconds double, "
    "error string"
)


@register("Pipeline")
class Pipeline(Algorithm):
    """Config: {"steps": [{"algorithm": "FullLoad", "params": {...}},
    {"algorithm": "QueryMaterialization", "params": {...}}, ...]}.
    Steps may also inline their params next to the 'algorithm' key.

    Optional ``report_location``: a per-step run report — (step,
    algorithm, status ok|failed|skipped, wall_seconds, error) — written
    as parquet, the chain-level sibling of ExpectationsCheck's report
    contract (operators/expectations.py): on a mid-chain failure the
    report lands on disk BEFORE the raise, so a scheduler that only
    sees the non-zero exit still has the evidence of which step died
    and how long each step ran. Rows-written-per-step is deliberately
    not reported: no algorithm exposes a count without paying an extra
    count() job over its output, and the report stays metadata-only by
    design."""

    def prepare(self) -> None:
        self.steps = _parse_steps(self.params.get_list("steps"))

    def read(self) -> list[DataFrame]:
        return []

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        return []

    def write(self, dfs: list[DataFrame]) -> None:
        import time

        rows: list[tuple] = []
        failure: Exception | None = None
        for i, (name, params) in enumerate(self.steps):
            if failure is not None:
                rows.append((i, name, "skipped", None, None))
                continue
            t0 = time.monotonic()
            try:
                REGISTRY[name](self.spark, ParamsFile(params)).run()
                rows.append(
                    (i, name, "ok", round(time.monotonic() - t0, 3), None)
                )
            except Exception as e:  # fail-fast, but report first
                rows.append(
                    (
                        i,
                        name,
                        "failed",
                        round(time.monotonic() - t0, 3),
                        f"{type(e).__name__}: {e}",
                    )
                )
                failure = e
        loc = self.params.get_optional("report_location")
        if loc:
            try:
                # a chain report is a handful of rows — one file
                self.spark.createDataFrame(rows, REPORT_SCHEMA).coalesce(
                    1
                ).write.mode("overwrite").parquet(loc)
            except Exception:
                # An unwritable report must never MASK the step failure
                # it exists to document — the step error is the one the
                # scheduler needs. On a successful chain the write
                # error is the only failure and does propagate.
                if failure is None:
                    raise
                import sys
                import traceback

                print(
                    f"Pipeline: report write to {loc!r} failed:\n"
                    + traceback.format_exc(),
                    file=sys.stderr,
                )
        if failure is not None:
            raise failure
