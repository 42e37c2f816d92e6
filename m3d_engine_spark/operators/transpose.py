"""Long→wide pivot (Transpose).

Reference parity: algo/Transpose.scala:74-79 —
``df.filter(pivot.isNotNull).groupBy(g).pivot(p, values).agg(first(v))``
plus schema enforcement (Transpose.scala:24-31).

Scale note: we always pass explicit ``pivot_values`` (from the target
schema, like the reference) — without them Spark runs an extra
distinct-collect job over the full table just to discover column names.
The pivot itself is a single hash aggregation: one shuffle on the group
keys with map-side partial aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.base import Algorithm, register
from m3d_engine_spark.plans.partitions import enforce_schema


def transpose(
    df: DataFrame,
    group_by_columns: Sequence[str],
    pivot_column: str,
    aggregation_column: str,
    pivot_values: Sequence[str] | None = None,
    agg: str = "first",
) -> DataFrame:
    """Pivot ``pivot_column``'s values into columns.

    ``agg`` names any Spark aggregate ("first", "sum", "count", ...);
    the reference is hard-wired to ``first`` (Transpose.scala:78).
    """
    filtered = df.filter(F.col(pivot_column).isNotNull())
    grouped = filtered.groupBy(*[F.col(c) for c in group_by_columns])
    pivoted = (
        grouped.pivot(pivot_column, list(pivot_values) if pivot_values else None)
        .agg(getattr(F, agg)(F.col(aggregation_column)))
    )
    return pivoted


@register("Transpose")
class TransposeAlgorithm(Algorithm):
    """Config keys: source_table/source_location, target_table,
    group_by_column[s], pivot_column, aggregation_column, target_schema."""

    def __init__(self, spark: SparkSession, params: ParamsFile):
        super().__init__(spark, params)
        self.target_schema = (
            StructType.fromJson(params.get_map("target_schema"))
            if params.has("target_schema")
            else None
        )

    def read(self) -> list[DataFrame]:
        if self.params.has("source_table"):
            return [self.spark.table(self.params.get_string("source_table"))]
        return [self.spark.read.parquet(self.params.get_string("source_location"))]

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        group_cols = self.params.get_optional("group_by_column")
        if group_cols is None:
            group_cols = self.params.get_list("group_by_columns")
        elif isinstance(group_cols, str):
            group_cols = [group_cols]
        pivot_values = None
        if self.target_schema is not None:
            pivot_values = [
                f.name for f in self.target_schema.fields if f.name not in group_cols
            ]
        out = transpose(
            dfs[0],
            group_cols,
            self.params.get_string("pivot_column"),
            self.params.get_string("aggregation_column"),
            pivot_values=pivot_values,
        )
        if self.target_schema is not None:
            out = enforce_schema(out, self.target_schema)
        return [out]

    def write(self, dfs: list[DataFrame]) -> None:
        from m3d_engine_spark.sources.writers import write_output

        write_output(self.spark, dfs[0], self.params)
