"""m3d_engine_spark — a PySpark-native, metadata-driven analytics engine.

A from-scratch rebuild of the capabilities of adidas/m3d-engine (a
configuration-driven Spark batch application for data-lake ingestion and
transformation; see SURVEY.md), re-expressed Spark-first:

* All relational work is declared through the DataFrame / SQL API so
  Catalyst gets predicate pushdown, column pruning, partition pruning and
  join selection for free.
* Load semantics (full swap, append, CDC condense+merge), partition
  management (date-component derivation, partition-level overwrite),
  data reshaping (nested flattening, transpose, fixed-width extraction)
  are implemented as composable DataFrame transforms plus thin,
  config-driven "algorithm" drivers.
* Beyond reference parity, the package ships large-scale training-data
  pipeline operators: deduplication (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search (brute-force and
  LSH-bucketed ANN), text analysis (language id, quality scoring, token
  counting, fingerprinting) and multimodal binary-column plumbing.

Everything is built from public PySpark APIs only.
"""

__version__ = "0.1.0"

from m3d_engine_spark.session import build_session  # noqa: F401
