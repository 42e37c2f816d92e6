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

import datetime as _dt
import logging
import re
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.base import Algorithm, register
from m3d_engine_spark.plans.partitions import partition_predicate

logger = logging.getLogger(__name__)

_CONDITION_RE = re.compile(r"(.+?)[ ]*=[ ]*(.+)")
_RULE_RE = re.compile(r"(year|month|week|day)([+-])([0-9]+)")


# parse_conditions lives in plans/partitions.py (shared with
# QueryMaterialization); re-exported here for the parity docstrings and
# existing importers.
from m3d_engine_spark.plans.partitions import parse_conditions  # noqa: F401,E402


def parse_select_rules(
    rules: Sequence[str],
    target_partitions: Sequence[str],
    today: _dt.date | None = None,
) -> list[tuple[str, str]]:
    """Reference select_rules: ["month-1", "day+2"] shift today by the
    named periods, then emit one partition criteria for the resulting
    date over a year/month/day, year/month or year/week scheme
    (FixedSizeStringExtractorConfiguration.scala:101-137). Parity
    includes the reference's calendar-year + ISO-week pairing and the
    empty-rules case (no rules → no criteria → no filter, :105-106)."""
    if not rules:
        return []
    date = today or _dt.date.today()
    allowed = set(target_partitions)
    for rule in rules:
        m = _RULE_RE.fullmatch(rule)
        if m is None:
            raise ValueError(f"Wrong select rule: {rule}")
        period, sign, value = m.group(1), m.group(2), int(m.group(3))
        if period not in allowed:
            raise ValueError(f"Unsupported period: {period}")
        delta = -value if sign == "-" else value
        if period == "day":
            date = date + _dt.timedelta(days=delta)
        elif period == "week":
            date = date + _dt.timedelta(weeks=delta)
        elif period == "month":
            # calendar-month arithmetic, day clamped (joda Months.plus)
            total = date.year * 12 + (date.month - 1) + delta
            y, mth = divmod(total, 12)
            last = (_dt.date(y + (mth + 1) // 12, (mth + 1) % 12 + 1, 1)
                    - _dt.timedelta(days=1)).day
            date = _dt.date(y, mth + 1, min(date.day, last))
        else:  # year
            try:
                date = date.replace(year=date.year + delta)
            except ValueError:  # Feb 29 → Feb 28
                date = date.replace(year=date.year + delta, day=28)
    tp = list(target_partitions)
    if tp == ["year", "month", "day"]:
        return [("year", str(date.year)), ("month", str(date.month)),
                ("day", str(date.day))]
    if tp == ["year", "month"]:
        return [("year", str(date.year)), ("month", str(date.month))]
    if tp == ["year", "week"]:
        return [("year", str(date.year)),
                ("week", str(date.isocalendar()[1]))]
    raise ValueError(f"Unsupported partitioning schema: {tp}")


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
    substring_positions ["1,11", ...], and EITHER an explicit
    target_fields/target_types list OR the reference's target_schema
    (Spark JSON) + target_partitions pair. Partition scoping:
    select_conditions as "col=value" strings (the reference format,
    FixedSizeStringExtractorConfiguration.scala:95-99) or [col, value]
    pairs, or select_rules date arithmetic (:101-137). Conditions on a
    non-partitioned config are ignored with a warning (:40-49)."""

    def _criteria(self) -> list[tuple[str, object]] | None:
        # Divergence from the reference's warn-and-ignore when the
        # config carries no target_partitions
        # (FixedSizeStringExtractorConfiguration.scala:40-49): provided
        # conditions always filter here — silently scanning the whole
        # table because a partitions key is missing turns a scoped
        # extract into a full-table overwrite, the worse failure.
        targets = self.params.get_optional("target_partitions", [])
        if self.params.has("select_conditions"):
            return parse_conditions(self.params.get_list("select_conditions"))
        if self.params.has("select_rules"):
            if not targets:
                logger.warning(
                    "Select rules can be applied to partitioned tables "
                    "only. Ignoring."
                )
                return None
            return parse_select_rules(self.params.get_list("select_rules"), targets)
        return None

    def read(self) -> list[DataFrame]:
        if self.params.has("source_table"):
            df = self.spark.table(self.params.get_string("source_table"))
        else:
            df = self.spark.read.parquet(self.params.get_string("source_location"))
        crit = self._criteria()
        if crit:
            df = df.filter(partition_predicate([crit]))
        return [df]

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        from m3d_engine_spark.config import ConfigError

        positions = self.params.get_list("substring_positions")
        schema_order: list[str] | None = None
        if self.params.has("target_schema"):
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(self.params.get_map("target_schema"))
            targets = set(self.params.get_optional("target_partitions", []))
            non_part = [f for f in schema.fields if f.name not in targets]
            names = [f.name for f in non_part]
            types = [f.dataType.simpleString() for f in non_part]
            keep = [f.name for f in schema.fields if f.name in targets]
            schema_order = [f.name for f in schema.fields]
        else:
            names = self.params.get_list("target_fields")
            types = self.params.get_optional("target_types") or ["string"] * len(names)
            keep = self.params.get_optional("keep_columns", [])
        if not (len(names) == len(positions) == len(types)):
            # reference message (FixedSizeStringExtractor.scala:33-35);
            # a plain zip would silently drop the unmatched tail fields
            raise ConfigError(
                "Field positions do not correspond to the target schema: "
                f"target_fields ({len(names)}), substring_positions "
                f"({len(positions)}), target_types ({len(types)})"
            )
        fields = []
        for name, pos, dtype in zip(names, positions, types):
            start, end = (int(x) for x in str(pos).split(","))
            fields.append(FixedField(name, start, end, dtype))
        out = extract_fixed_width(
            dfs[0], self.params.get_string("source_field"), fields, keep
        )
        if schema_order:
            # reference emits targetSchema.fieldNames order
            # (FixedSizeStringExtractor.scala:47)
            out = out.select(*schema_order)
        return [out]

    def write(self, dfs: list[DataFrame]) -> None:
        from m3d_engine_spark.sources.writers import write_output

        write_output(self.spark, dfs[0], self.params)
