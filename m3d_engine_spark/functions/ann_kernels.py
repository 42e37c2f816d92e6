"""Arrow-batched ANN kernels.

NOTE: this module deliberately has NO ``from __future__ import
annotations`` — pandas_udf resolves the kernel's type hints at runtime,
and postponed annotations would turn them into unresolvable strings.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


def make_bucket_udf(plane_matrix: np.ndarray, tables: int, bits: int):
    """UDF computing all ``tables`` hyperplane-LSH buckets of a vector
    in one (batch × dim) @ (dim × tables·bits) matmul — the vectorized
    replacement for tables·bits separate dot-product Column trees."""
    weights = np.array([1 << i for i in range(bits)], dtype=np.int64)

    @pandas_udf("array<int>")
    def all_buckets(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)              # n × dim
        signs = (m @ plane_matrix) > 0                             # n × tables·bits
        per_table = signs.reshape(len(m), tables, bits) @ weights  # n × tables
        return pd.Series(per_table.astype(np.int32).tolist())

    return all_buckets


def make_project_udf(matrix: "np.ndarray", scale: float = 1e4):
    """UDF computing a QUANTIZED random projection of a vector batch in
    one (batch × dim) @ (dim × r) matmul: coordinates are rounded to
    int64 at ``scale`` so every downstream score derives from exact
    integers (identical across engines and summation orders; the only
    residual hazard is a true dot product within ~1e-14 of a grid
    midpoint — same caveat as the sign kernel, never observed)."""

    @pandas_udf("array<bigint>")
    def project(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)  # n × dim
        red = np.round(m @ matrix * scale).astype(np.int64)  # n × r
        return pd.Series(red.tolist())

    return project
