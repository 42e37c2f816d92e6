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

from m3d_engine_spark.operators.base import Algorithm, register

DEFAULT_CHARS_TO_REPLACE = r"[.:#]+"
DEFAULT_REPLACEMENT = "_"
DEFAULT_SEPARATOR = "__"


def _cleanse(name: str, chars_to_replace: str, replacement: str) -> str:
    return re.sub(chars_to_replace, replacement, name)


def explode_arrays(
    df: DataFrame,
    explode_columns: Sequence[str],
    separator: str = DEFAULT_SEPARATOR,
) -> DataFrame:
    """explode_outer each listed (possibly nested) array column in
    order. For a nested path the exploded field is REMOVED from its
    parent struct (dropFields) rather than the whole parent dropped —
    sibling fields survive to the struct-flatten pass (the contract:
    ``column_mapping=None`` keeps everything)."""
    for name in explode_columns:
        parts = name.split(".")
        quoted = ".".join(f"`{p}`" for p in parts)
        flat = separator.join(parts)
        df = df.withColumn(flat, F.explode_outer(F.col(quoted)))
        if flat != name and parts[0] in df.columns:
            df = _drop_nested_field(df, parts)
    return df


def _drop_nested_field(df: DataFrame, parts: Sequence[str]) -> DataFrame:
    """Remove the nested field ``parts[0].parts[1]...`` from its parent
    struct. ``dropFields`` raises CANNOT_DROP_ALL_FIELDS when the field
    is its struct's ONLY member, so drop at the deepest ancestor that
    keeps at least one other field — bubbling up to ``df.drop`` when the
    whole top-level struct is just this one chain. The schema walk
    resolves names case-insensitively (like the analyzer that just
    resolved the explode); if it cannot follow the path at all (field
    genuinely absent, or an intermediate node isn't a struct), fall
    back to plain ``dropFields`` so the failure stays loud instead of
    silently dropping the whole parent column and its siblings."""
    folded = [p.casefold() for p in parts]
    top = next(
        (f for f in df.schema.fields if f.name.casefold() == folded[0]), None
    )
    node = top.dataType if top is not None else None
    counts = []  # field count of the struct at path parts[: i + 1]
    for p in folded[1:]:
        if not isinstance(node, StructType):
            break
        child = next(
            (f for f in node.fields if f.name.casefold() == p), None
        )
        if child is None:
            break
        counts.append(len(node.fields))
        node = child.dataType
    if len(counts) != len(parts) - 1:
        # walk failed — preserve the pre-existing loud behavior
        return df.withColumn(
            parts[0], F.col(f"`{parts[0]}`").dropFields(".".join(parts[1:]))
        )
    drop_at = next(
        (i for i in range(len(counts) - 1, -1, -1) if counts[i] > 1), None
    )
    if drop_at is None:
        return df.drop(parts[0])
    return df.withColumn(
        parts[0],
        F.col(f"`{parts[0]}`").dropFields(".".join(parts[1 : drop_at + 2])),
    )


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


def flat_dataframe(
    df: DataFrame,
    fields_to_flatten: Sequence[str],
    column_mapping: Mapping[str, str] | None = None,
    chars_to_replace: str = DEFAULT_CHARS_TO_REPLACE,
    replacement: str = DEFAULT_REPLACEMENT,
    side_flatten: Mapping[str, Sequence[str]] | None = None,
    separator: str = DEFAULT_SEPARATOR,
) -> DataFrame:
    """Reference-parity flattening (NestedFlattener.scala:95-205):

    * struct/array columns **listed** in ``fields_to_flatten`` are
      flattened (children → ``parent__child`` with char cleansing) or
      exploded (``explode_outer``); nested levels surface under their
      flattened names and are processed when listed too;
    * struct/array columns **not listed** are dropped (the reference's
      ``dropFieldIfNotForFlattening``);
    * ``side_flatten`` maps an array column to positional extracts named
      ``["newname__idx", ...]`` (NestedFlattener.scala:142-148) — the
      array is replaced by one column per entry;
    * ``column_mapping`` finally selects + renames; unmapped columns are
      excluded (NestedFlattener.scala:207-215).

    Each step is a projection or a Generate — no shuffle at any depth.
    """
    side = dict(side_flatten or {})
    progress = True
    while progress:
        progress = False
        for f in df.schema.fields:
            name = f.name
            if isinstance(f.dataType, ArrayType):
                if name in side:
                    continue
                if name in fields_to_flatten:
                    df = df.withColumn(name, F.explode_outer(F.col(f"`{name}`")))
                else:
                    df = df.drop(name)
                progress = True
                break  # schema changed — rescan
            if isinstance(f.dataType, StructType):
                if name in fields_to_flatten:
                    others = [F.col(f"`{c}`") for c in df.columns if c != name]
                    # the PARENT name is cleansed too (reference
                    # NestedFlattener.scala:64-93 cleanses every level)
                    # so a key like 'a.b' yields 'a_b__sub', matching
                    # mappings written against cleansed names
                    parent_clean = _cleanse(name, chars_to_replace, replacement)
                    children = [
                        F.col(f"`{name}`.`{sub.name}`").alias(
                            f"{parent_clean}{separator}{_cleanse(sub.name, chars_to_replace, replacement)}"
                        )
                        for sub in f.dataType.fields
                    ]
                    df = df.select(*others, *children)
                else:
                    df = df.drop(name)
                progress = True
                break
    for col, entries in side.items():
        for entry in entries:
            new, _, idx = entry.rpartition(separator)
            df = df.withColumn(new, F.get(F.col(f"`{col}`"), int(idx)))
        df = df.drop(col)
    if column_mapping:
        # Reference semantics (NestedFlattener.scala:207-213): iterate
        # the EXISTING columns — rename the mapped ones, drop the rest.
        # Mapping keys without a surviving column (e.g. an array that a
        # side-flatten consumed) are simply unused, not an error.
        df = df.select(
            *[
                F.col(f"`{c}`").alias(column_mapping[c])
                for c in df.columns
                if c in column_mapping
            ]
        )
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
        df = explode_arrays(df, top, separator)
        remaining = [c for c in remaining if c not in top]
        df = flatten_structs(df, separator, chars_to_replace, replacement)
    df = flatten_structs(df, separator, chars_to_replace, replacement)
    for col, n in (side_flatten_columns or {}).items():
        df = side_flatten(df, col, n)
    if column_mapping:
        df = df.select(*[F.col(f"`{src}`").alias(dst) for src, dst in column_mapping.items()])
    return df


@register("NestedFlattener")
class NestedFlattenerAlgorithm(Algorithm):
    """Dispatchable flattening job (algo/NestedFlattener.scala +
    config/NestedFlattenerConfiguration.scala).

    Config: source_location (parquet), target_table OR target_location,
    target_partitions, chars_to_replace (default ``[.:#]+``),
    replacement_char (default ``_``), fields_to_flatten,
    column_mapping, side_flatten {col: ["newname__idx", ...]}.

    Load mode mirrors the reference: OverwritePartitions when
    partitioned, OverwriteTable otherwise
    (NestedFlattenerConfiguration.scala:53-66).
    """

    def read(self) -> list[DataFrame]:
        if self.params.has("source_location"):
            return [self.spark.read.parquet(self.params.get_string("source_location"))]
        return [self.spark.table(self.params.get_string("source_table"))]

    def transform(self, dfs: list[DataFrame]) -> list[DataFrame]:
        p = self.params
        return [
            flat_dataframe(
                dfs[0],
                p.get_list("fields_to_flatten"),
                p.get_optional("column_mapping"),
                chars_to_replace=p.get_optional("chars_to_replace", DEFAULT_CHARS_TO_REPLACE),
                replacement=p.get_optional("replacement_char", DEFAULT_REPLACEMENT),
                side_flatten=p.get_optional("side_flatten"),
            )
        ]

    def write(self, dfs: list[DataFrame]) -> None:
        from m3d_engine_spark.sources.writers import write_output

        default = (
            "OverwritePartitions"
            if self.params.get_optional("target_partitions")
            else "OverwriteTable"
        )
        write_output(self.spark, dfs[0], self.params, default_load_mode=default)
