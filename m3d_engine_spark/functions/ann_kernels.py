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
