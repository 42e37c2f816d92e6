"""Vector (embedding) column expressions.

Embeddings ride as ``array<float>`` columns. Dot products / norms are
computed with higher-order functions (``zip_with`` + ``aggregate``) in
double precision — JVM-side, no Python UDF, no Arrow round-trip. For
very wide vectors a pandas_udf batch kernel can be swapped in, but at
64-1024 dims the expression form stays inside codegen and avoids
serialization entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, left-to-right summation order (so
    results are bit-stable and reproducible across runs/engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_lsh_bucket(a: Column, n_bits: int = 4) -> Column:
    """Axis-aligned sign-LSH bucket id from the first ``n_bits`` vector
    components: bit i = (a[i] > 0). 2^n_bits buckets.

    This is the cheapest member of the random-hyperplane LSH family
    (hyperplanes = coordinate axes). For production ANN swap in seeded
    random hyperplanes; the bucketing/join topology is identical: bucket
    is a shuffle key, so candidate generation is a co-partitioned
    self-join instead of a full cross join — the O(n²)→O(n²/2^bits)
    reduction that makes ANN feasible at 10⁹ vectors.
    """
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(F.element_at(a, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket
