"""Column-expression building blocks (no Python UDFs in the hot path)."""

from m3d_engine_spark.functions.dates import (  # noqa: F401
    aligned_week_of_year,
    with_date_components,
)
