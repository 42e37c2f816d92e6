"""Nested-structure flattening for semi-structured data.

Reference parity: algo/NestedFlattener.scala —
* struct flatten with ``__`` separator (NestedFlattener.scala:184-198),
* array ``explode_outer`` for configured columns (:132-140),
* positional side-flatten ``arr.getItem(i)`` (:142-148),
* field-name cleansing ``[.:#]+ → _`` (:64-93 — done there via an RDD
  re-createDataFrame; here cleansing happens in the flattening aliases,
  so the plan stays pure projections/generators and never leaves
  Catalyst),
* column_mapping rename + prune (:207-215).

Scale note: each explode is a Generate node (no shuffle); struct
flattening is pure projection. Flattening 100 TB of nested JSON is a
map-only pipeline — the only care point is exploding multiple sibling
arrays (cartesian per row), which the operator refuses unless
explicitly listed, matching the reference's explicit explode config.
"""

from __future__ import annotations

import re
from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

DEFAULT_CHARS_TO_REPLACE = r"[.:#]+"
DEFAULT_REPLACEMENT = "_"
DEFAULT_SEPARATOR = "__"


def _cleanse(name: str, chars_to_replace: str, replacement: str) -> str:
    return re.sub(chars_to_replace, replacement, name)


def explode_arrays(df: DataFrame, explode_columns: Sequence[str]) -> DataFrame:
    """explode_outer each listed (possibly nested) array column in order."""
    for name in explode_columns:
        parts = name.split(".")
        quoted = ".".join(f"`{p}`" for p in parts)
        flat = "__".join(parts)
        df = df.withColumn(flat, F.explode_outer(F.col(quoted)))
        if flat != name and parts[0] in df.columns:
            df = df.drop(parts[0])
    return df


def side_flatten(df: DataFrame, column: str, size: int) -> DataFrame:
    """arr → arr_0 .. arr_{size-1} (reference :142-148 used getItem;
    under ANSI mode an out-of-bounds getItem throws INVALID_ARRAY_INDEX,
    so use ``F.get`` which yields NULL like the pre-ANSI reference)."""
    for i in range(size):
        df = df.withColumn(f"{column}_{i}", F.get(F.col(f"`{column}`"), i))
    return df.drop(column)


def flatten_structs(
    df: DataFrame,
    separator: str = DEFAULT_SEPARATOR,
    chars_to_replace: str = DEFAULT_CHARS_TO_REPLACE,
    replacement: str = DEFAULT_REPLACEMENT,
) -> DataFrame:
    """Iteratively project struct fields up to top level with cleansed
    ``parent__child`` names until no struct columns remain."""
    while any(isinstance(f.dataType, StructType) for f in df.schema.fields):
        cols = []
        for f in df.schema.fields:
            clean = _cleanse(f.name, chars_to_replace, replacement)
            if isinstance(f.dataType, StructType):
                for sub in f.dataType.fields:
                    sub_clean = _cleanse(sub.name, chars_to_replace, replacement)
                    cols.append(
                        F.col(f"`{f.name}`").getField(sub.name).alias(f"{clean}{separator}{sub_clean}")
                    )
            else:
                cols.append(F.col(f"`{f.name}`").alias(clean))
        df = df.select(*cols)
    return df


def flatten(
    df: DataFrame,
    explode_columns: Sequence[str] = (),
    column_mapping: Mapping[str, str] | None = None,
    separator: str = DEFAULT_SEPARATOR,
    chars_to_replace: str = DEFAULT_CHARS_TO_REPLACE,
    replacement: str = DEFAULT_REPLACEMENT,
    side_flatten_columns: Mapping[str, int] | None = None,
) -> DataFrame:
    """Full flattening pipeline: explode → struct-flatten → (repeat while
    exploded structs exposed new arrays listed for explosion) → rename/
    prune via ``column_mapping`` (None keeps everything)."""
    remaining = list(explode_columns)
    # Explodes may expose nested arrays (events[].data.items[]): iterate.
    for _ in range(8):
        top = [c for c in remaining if c.split(".")[0] in df.columns]
        if not top:
            break
        df = explode_arrays(df, top)
        remaining = [c for c in remaining if c not in top]
        df = flatten_structs(df, separator, chars_to_replace, replacement)
    df = flatten_structs(df, separator, chars_to_replace, replacement)
    for col, n in (side_flatten_columns or {}).items():
        df = side_flatten(df, col, n)
    if column_mapping:
        df = df.select(*[F.col(f"`{src}`").alias(dst) for src, dst in column_mapping.items()])
    return df
