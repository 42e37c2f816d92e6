"""In-load data reshaping: the ``additional_task`` chain.

Reference parity: algo/shared/DataReshapingTask.scala:25-80 +
config/shared/DataReshapingTaskConfig.scala — loads (FullLoad, the
semistructured AppendLoad) can run a nested-flatten → transpose →
date-partition-derivation → schema-check chain inside their transform
step, driven by an ``additional_task`` object in the params file:

```json
"additional_task": {
  "nested_task_properties": {
    "fields_to_flatten": [...], "column_mapping": {...},
    "chars_to_replace": "[.:#]+", "replacement_char": "_",
    "side_flatten": {"arr_col": ["newname__0", ...]}
  },
  "transpose_task_properties": {
    "pivot_column": "...", "aggregation_column": "...",
    "group_by_column": [...]
  },
  "enforce_schema": true
}
```

Every step is a projection/Generate or one pivot aggregation — the
chain adds no extra shuffles beyond the pivot itself.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from m3d_engine_spark.functions.dates import with_date_components
from m3d_engine_spark.operators.nested_flattener import (
    DEFAULT_CHARS_TO_REPLACE,
    DEFAULT_REPLACEMENT,
    flat_dataframe,
)
from m3d_engine_spark.operators.transpose import transpose
from m3d_engine_spark.plans.partitions import check_schema


def apply_additional_task(
    df: DataFrame,
    task: Mapping[str, Any],
    target_schema: StructType | None = None,
    partition_column: str = "",
    partition_column_format: str = "",
    target_partitions: Sequence[str] = (),
) -> DataFrame:
    """Run the reshaping chain in the reference's fixed order
    (DataReshapingTask.scala:37-42): flatten → transpose → date
    partition derivation → schema check."""
    nested = task.get("nested_task_properties")
    if nested:
        df = flat_dataframe(
            df,
            nested["fields_to_flatten"],
            nested.get("column_mapping"),
            chars_to_replace=nested.get("chars_to_replace", DEFAULT_CHARS_TO_REPLACE),
            replacement=nested.get("replacement_char", DEFAULT_REPLACEMENT),
            side_flatten=nested.get("side_flatten"),
        )
    tp = task.get("transpose_task_properties")
    if tp:
        group_cols = tp["group_by_column"]
        if isinstance(group_cols, str):
            group_cols = [group_cols]
        pivot_values = None
        if target_schema is not None:
            skip = set(group_cols) | set(target_partitions)
            pivot_values = [f.name for f in target_schema.fields if f.name not in skip]
        df = transpose(
            df,
            group_cols,
            tp["pivot_column"],
            tp["aggregation_column"],
            pivot_values=pivot_values,
        )
    if partition_column and target_partitions:
        df = with_date_components(
            df, partition_column, partition_column_format, target_partitions
        )
    if task.get("enforce_schema") and target_schema is not None:
        df = check_schema(df, target_schema)
    return df
