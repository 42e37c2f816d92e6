"""Fixed-width string extraction.

Reference parity: algo/FixedSizeStringExtractor.scala:37-60 — parse a
fixed-width text column into typed target columns; blank fields → NULL;
optional partition scoping via select_conditions.

The reference used a Scala UDF per field; here each field is
``nullif(trim(substring(...)), '') :: type`` — pure expressions inside
whole-stage codegen, so extraction of N fields from 100 TB of logs is a
map-only scan with full column pruning on the output side.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.base import Algorithm, register
from m3d_engine_spark.plans.partitions import partition_predicate


@dataclass(frozen=True)
class FixedField:
    name: str
    start: int  # 1-based, inclusive (reference convention)
    end: int    # 1-based, inclusive
    dtype: str = "string"


def extract_field(source: Column, field: FixedField) -> Column:
    raw = F.substring(source, field.start, field.end - field.start + 1)
    # try_cast, not cast: under this build's ANSI default a single
    # malformed slot ('12x' in an int field) would abort the whole
    # scan; the reference (pre-ANSI cast) yielded NULL — same tolerance
    # the blank→NULL nullif above already promises.
    return (
        F.nullif(F.trim(raw), F.lit(""))
        .try_cast(field.dtype)
        .alias(field.name)
    )


def extract_fixed_width(
    df: DataFrame,
    source_column: str,
    fields: Sequence[FixedField],
    keep_columns: Sequence[str] = (),
) -> DataFrame:
    """Project the fixed-width ``source_column`` into typed columns,
    optionally carrying ``keep_columns`` (e.g. partition cols) through."""
    src = F.col(source_column)
    cols = [F.col(c) for c in keep_columns] + [extract_field(src, f) for f in fields]
    return df.select(*cols)


@register("FixedSizeStringExtractor")
class FixedSizeStringExtractorAlgorithm(Algorithm):
    """Config keys: source_table/source_location, source_field,
    substring_positions ["1,11", ...], target_schema-ish field list,
    select_conditions [["year",2019],["month",2]] (partition scope)."""

    def read(self) -> list[DataFrame]:
        if self.params.has("source_table"):
            df = self.spark.table(self.params.get_string("source_table"))
        else:
            df = self.spark.read.parquet(self.params.get_string("source_location"))
        if self.params.has("select_conditions"):
            crit = [[tuple(c) for c in self.params.get_list("select_conditions")]]
            df = df.filter(partition_predicate(crit))
        return [df]

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        positions = self.params.get_list("substring_positions")
        names = self.params.get_list("target_fields")
        types = self.params.get_optional("target_types") or ["string"] * len(names)
        if not (len(names) == len(positions) == len(types)):
            from m3d_engine_spark.config import ConfigError

            raise ConfigError(
                f"target_fields ({len(names)}), substring_positions "
                f"({len(positions)}) and target_types ({len(types)}) "
                f"must align — a plain zip would silently drop the "
                f"unmatched tail fields"
            )
        fields = []
        for name, pos, dtype in zip(names, positions, types):
            start, end = (int(x) for x in str(pos).split(","))
            fields.append(FixedField(name, start, end, dtype))
        keep = self.params.get_optional("keep_columns", [])
        return [
            extract_fixed_width(dfs[0], self.params.get_string("source_field"), fields, keep)
        ]

    def write(self, dfs: list[DataFrame]) -> None:
        from m3d_engine_spark.sources.writers import write_output

        write_output(self.spark, dfs[0], self.params)
