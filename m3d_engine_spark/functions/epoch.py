"""Type-agnostic epoch-microsecond extraction.

The event-time operators (sessionize, as-of join, range join) compare
timestamps as epoch microseconds. Depending on who wrote the parquet,
an event-time column arrives as one of three physical encodings:

* ``TIMESTAMP`` (tz-aware)            — ``unix_micros`` works directly;
* ``TIMESTAMP_NTZ`` (tz-naive µs, the pandas/pyarrow default since the
  2026-08 testdata regeneration) — ``unix_micros`` REJECTS it
  (DATATYPE_MISMATCH), but a cast to TIMESTAMP under the engine's
  pinned UTC session zone (session.py SCALE_DEFAULTS) is exact: the
  naive wall-clock is interpreted as UTC, matching how DuckDB's
  ``epoch_us`` treats a naive timestamp;
* ``BIGINT`` epoch **nanoseconds** (the legacy
  ``spark.sql.legacy.parquet.nanosAsLong`` read of TIMESTAMP(NANOS)
  files) — integer-divide to µs. Division is done in DECIMAL(38,0), not
  DOUBLE: epoch-ns values (~1.7e18) exceed 2^53, so a double round-trip
  could be off by a full microsecond. Truncation (== floor for the
  post-1970 values this engine handles) matches DuckDB's ns→µs cast.

Every operator that needs epoch micros goes through here, so a testdata
regeneration that flips the encoding changes NOTHING downstream
(VERDICT r4 "What's wrong" #1 — three operators failed analysis because
they assumed TIMESTAMP).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    IntegerType,
    LongType,
    TimestampNTZType,
    TimestampType,
)


def epoch_us(col: Column | str, dtype: DataType) -> Column:
    """Epoch microseconds (BIGINT) from ``col`` of declared ``dtype``.

    Accepts TIMESTAMP, TIMESTAMP_NTZ (interpreted in the session zone —
    the engine pins UTC), and BIGINT epoch-nanoseconds. Raises for
    anything else rather than guessing a unit.
    """
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(dtype, TimestampType):
        return F.unix_micros(c)
    if isinstance(dtype, TimestampNTZType):
        return F.unix_micros(c.cast("timestamp"))
    if isinstance(dtype, LongType):
        # epoch ns -> µs; decimal division keeps 19-digit exactness.
        return F.floor(c.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    if isinstance(dtype, IntegerType):
        # A 32-bit int cannot hold any realistic epoch-ns value; it is
        # far more likely epoch SECONDS — refuse rather than guess.
        raise TypeError(
            "epoch_us: IntegerType event-time is ambiguous (epoch "
            "seconds? truncated ns?) — cast to TIMESTAMP or BIGINT ns "
            "explicitly"
        )
    raise TypeError(f"epoch_us: unsupported event-time type {dtype}")


def epoch_us_of(df: DataFrame, name: str) -> Column:
    """``epoch_us`` with the dtype looked up from ``df``'s schema."""
    return epoch_us(F.col(name), df.schema[name].dataType)


def as_timestamp(col: Column | str, dtype: DataType) -> Column:
    """Normalize any accepted event-time encoding to a true TIMESTAMP
    column (UTC session zone). Used by loaders so downstream plans see
    one canonical type regardless of the file encoding."""
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(dtype, TimestampType):
        return c
    if isinstance(dtype, TimestampNTZType):
        return c.cast("timestamp")
    if isinstance(dtype, LongType):
        return F.timestamp_micros(
            F.floor(c.cast("decimal(38,0)") / F.lit(1000)).cast("long")
        )
    if isinstance(dtype, IntegerType):
        raise TypeError(
            "as_timestamp: IntegerType event-time is ambiguous — cast "
            "to TIMESTAMP or BIGINT ns explicitly"
        )
    raise TypeError(f"as_timestamp: unsupported event-time type {dtype}")
