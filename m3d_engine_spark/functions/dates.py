"""Date-component derivation for partition columns.

Reference parity: algo/shared/DateComponentDerivation.scala:17-141 +
CustomDateFormatters.scala:9-49. Semantics reproduced:

* derive ``year`` / ``month`` / ``day`` / ``week`` partition columns from
  a source date column given a format string;
* unparseable/invalid dates map to sentinel partitions: year=9999,
  month/day/week=99 (DateComponentDerivation.scala:88-90,100-102,144-148);
* ``week`` uses ALIGNED week-of-year (week 1 = Jan 1-7, i.e.
  ``floor((dayofyear-1)/7)+1``), NOT ISO weeks — Spark's ``weekofyear``
  is ISO and would disagree around year boundaries (SURVEY.md §2.9);
* week-based formats ``yyyyww`` / ``yyyywwe`` carry year+week directly in
  the string (no calendar date exists), so year/week are substring-parsed
  and validated.

Everything is built from Column expressions — the reference used four
Scala UDFs here (DateComponentDerivation.scala:75-130); expression form
keeps whole-stage codegen and lets the derived values constant-fold when
the source column is a literal.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

YEAR_SENTINEL = 9999
OTHER_SENTINEL = 99

# Formats the reference understands (CustomDateFormatters.scala:9-49).
_DATE_FORMATS = {
    "yyyyMMdd": ("yyyyMMdd", {"year", "month", "day", "week"}),
    "yyyy-MM-dd": ("yyyy-MM-dd", {"year", "month", "day", "week"}),
    "MM/dd/yyyy": ("MM/dd/yyyy", {"year", "month", "day", "week"}),
    "yyyy-MM-dd HH:mm:ss": ("yyyy-MM-dd HH:mm:ss", {"year", "month", "day", "week"}),
    "yyyyMM": ("yyyyMM", {"year", "month"}),
}
_WEEK_FORMATS = {"yyyyww", "yyyywwe"}


def aligned_week_of_year(date_col: Column) -> Column:
    """ALIGNED_WEEK_OF_YEAR: week 1 = Jan 1-7 (java.time semantics the
    reference relied on); differs from ISO ``weekofyear``."""
    return (F.floor((F.dayofyear(date_col) - F.lit(1)) / F.lit(7)) + F.lit(1)).cast("int")


def _parsed_date(col: Column, fmt: str) -> Column:
    # try_to_date → NULL on malformed input regardless of ANSI mode.
    return F.try_to_date(col.cast("string"), fmt)


def date_component_columns(
    source: Column, source_format: str, targets: Sequence[str]
) -> dict[str, Column]:
    """Column expressions for the requested partition targets.

    ``targets`` ⊆ {year, month, day, week}; components the format cannot
    express — and any unparseable row — yield the sentinel values.
    """
    out: dict[str, Column] = {}
    if source_format in _WEEK_FORMATS:
        s = source.cast("string")
        year = F.try_to_number(F.substring(s, 1, 4), F.lit("9999")).cast("int")
        week = F.try_to_number(F.substring(s, 5, 2), F.lit("99")).cast("int")
        expected_len = 6 if source_format == "yyyyww" else 7
        valid = (
            (F.length(s) == expected_len)
            & year.isNotNull()
            & week.isNotNull()
            & week.between(1, 53)
        )
        comp = {
            "year": F.when(valid, year),
            "week": F.when(valid, week),
        }
    elif source_format in _DATE_FORMATS:
        fmt, expressible = _DATE_FORMATS[source_format]
        d = _parsed_date(source, fmt)
        comp = {}
        if "year" in expressible:
            comp["year"] = F.year(d)
        if "month" in expressible:
            comp["month"] = F.month(d)
        if "day" in expressible:
            comp["day"] = F.dayofmonth(d)
        if "week" in expressible:
            comp["week"] = aligned_week_of_year(d)
    else:
        # Any other string is tried as a plain datetime pattern, like the
        # reference's DateTimeFormatter.ofPattern fallback
        # (DateComponentDerivation.scala:108-140): rows the pattern
        # cannot parse — including EVERY row when the configured format
        # simply doesn't match the data (e.g. ddMMyy against yyyyMMdd
        # values) — land in the sentinel partition instead of failing.
        d = _parsed_date(source, source_format)
        comp = {
            "year": F.year(d),
            "month": F.month(d),
            "day": F.dayofmonth(d),
            "week": aligned_week_of_year(d),
        }

    for t in targets:
        if t not in {"year", "month", "day", "week"}:
            raise ValueError(f"unsupported partition target {t!r}")
        sentinel = YEAR_SENTINEL if t == "year" else OTHER_SENTINEL
        expr = comp.get(t, F.lit(None))
        out[t] = F.coalesce(expr, F.lit(sentinel)).cast("int").alias(t)
    return out


def with_date_components(
    df: DataFrame, source_column: str, source_format: str, targets: Sequence[str]
) -> DataFrame:
    """Append derived partition columns (the FullLoad/AppendLoad
    transform step, FullLoad.scala:36-45)."""
    cols = date_component_columns(F.col(source_column), source_format, targets)
    return df.withColumns(cols)
