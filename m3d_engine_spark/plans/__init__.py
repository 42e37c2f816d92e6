"""Logical-plan helpers: partition predicates, schema alignment."""

from m3d_engine_spark.plans.partitions import (  # noqa: F401
    add_missing_columns,
    collect_partitions,
    partition_predicate,
)
