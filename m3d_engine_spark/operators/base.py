"""Algorithm base class + dispatch registry.

Reference parity: algo/core/Algorithm.scala:33-42 — every job is a fixed
``read → transform → write → update_statistics`` pipeline — and the
class-name dispatch in AlgorithmFactory.scala:66-83, which becomes a
plain registry dict here.

Unlike the reference (whose Scala trait vals eagerly DESCRIBE tables and
compute locations at construction), config resolution is an explicit
``prepare()`` step so constructors stay pure and unit-testable
(SURVEY.md §7.3.5).
"""

from __future__ import annotations

import abc
from typing import Callable, Type

from pyspark.sql import DataFrame, SparkSession

from m3d_engine_spark.config import ParamsFile

REGISTRY: dict[str, Type["Algorithm"]] = {}


def register(cli_name: str) -> Callable[[Type["Algorithm"]], Type["Algorithm"]]:
    def deco(cls: Type["Algorithm"]) -> Type["Algorithm"]:
        REGISTRY[cli_name] = cls
        cls.cli_name = cli_name
        return cls

    return deco


class Algorithm(abc.ABC):
    """read → transform → write → update_statistics."""

    cli_name: str = ""

    def __init__(self, spark: SparkSession, params: ParamsFile):
        self.spark = spark
        self.params = params
        # DataFrames persisted for the duration of one run(); always
        # unpersisted when the run ends so long-lived sessions (thrift
        # server, notebook, test suite) never accumulate cached blocks.
        self._persisted: list[DataFrame] = []
        # localCheckpoint'd frames (lineage-cut tiers pass this as
        # their `track` list). Freed separately because
        # DataFrame.unpersist() only uncaches the plan — checkpoint
        # blocks live behind the LogicalRDD and need the RDD-level
        # unpersist (operators/suffix.py:unpersist_checkpoints).
        self._checkpointed: list[DataFrame] = []

    def prepare(self) -> None:
        """Resolve catalog/location state (side-effectful; optional)."""

    @abc.abstractmethod
    def read(self) -> list[DataFrame]: ...

    @abc.abstractmethod
    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]: ...

    @abc.abstractmethod
    def write(self, dfs: list[DataFrame]) -> None: ...

    def update_statistics(self) -> None:
        """ANALYZE TABLE step (reference: algo/core/TableStatistics.scala);
        overridden by catalog-backed algorithms."""

    def run(self) -> None:
        try:
            self.prepare()
            self.write(self.transform(self.read()))
            if self.params.get_optional("compute_table_statistics", False):
                self.update_statistics()
        finally:
            for df in self._persisted:
                df.unpersist()
            self._persisted.clear()
            if self._checkpointed:
                from m3d_engine_spark.operators.suffix import (
                    unpersist_checkpoints,
                )

                unpersist_checkpoints(self._checkpointed)
                self._checkpointed.clear()


def run_algorithm(spark: SparkSession, name: str, params_path: str) -> None:
    if name not in REGISTRY:
        raise KeyError(f"unknown algorithm {name!r}; known: {sorted(REGISTRY)}")
    REGISTRY[name](spark, ParamsFile.load(params_path)).run()
