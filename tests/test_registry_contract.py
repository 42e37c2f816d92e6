"""Registry-wide driver-contract guards.

The round driver canonicalizes each ``queries()`` result with pandas
(sort over all columns, then hash); non-scalar cells (array / struct /
map) are unhashable there and turn a mathematically-correct entry into
a red driver row — exactly what happened to ``kmeans_train`` in round
7 (``CORRECTNESS_r07.json``: ``TypeError: unhashable type: 'list'``)
while the tuple-izing local gate stayed green. This walk pins the
contract the local gate cannot see: every output column of every
registry entry must be scalar.

Construction is done on a thread pool: building a registry DataFrame
is mostly driver-side analysis, and the handful of entries that run
collects at build time (kmeans, pagerank, calibration) overlap, so the
full 200-entry walk costs ~20 s on the shared session instead of ~95 s
serial — cheap enough for the default lane, which is where a guard
against future registry additions has to live.
"""

from concurrent.futures import ThreadPoolExecutor

import __spark_entry__ as entry

_NON_SCALAR = ("array", "struct", "map")


def test_every_registry_entry_has_scalar_only_schema(spark, sf_dir):
    queries = entry.queries()

    def offenders(item):
        name, fn = item
        df = fn(spark, sf_dir)
        return [
            (name, f.name, f.dataType.typeName())
            for f in df.schema.fields
            if f.dataType.typeName() in _NON_SCALAR
        ]

    with ThreadPoolExecutor(max_workers=12) as ex:
        results = list(ex.map(offenders, queries.items()))
    bad = [o for r in results for o in r]
    assert bad == [], (
        "driver canonicalizer cannot hash non-scalar cells; "
        f"explode/flatten these columns: {bad}"
    )


def test_no_oracle_column_types_hugeint(sf_dir):
    """The driver hashes the DuckDB result through pandas ``.df()``,
    which renders HUGEINT as float64 — so an uncast ``SUM(BIGINT)``
    (DuckDB types it HUGEINT) dtype-mismatches a Spark int64 column
    even when every value is identical (round 8: ``budget_select``,
    ``kanon_census``, ``bpe_pairs``; the fetchall-based local gate is
    blind to it because Python ints compare equal). ``DESCRIBE`` plans
    each oracle without executing it, so the whole registry checks in
    seconds. Rule: always ``CAST(SUM(...) AS BIGINT)`` — window sums
    and every UNION arm included (UNION type-unifies the column)."""
    import duckdb

    from m3d_engine_spark.sources.testdata import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name, sql in entry.oracle_sql().items():
        for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
            if "HUGEINT" in typ.upper():
                bad.append((name, col, typ))
    con.close()
    assert bad == [], (
        "pandas renders HUGEINT as float64 and the driver hashes dtypes; "
        f"CAST these oracle columns to BIGINT: {bad}"
    )


def test_oracle_keys_subset_of_queries_and_no_duplicates():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    # dict literals silently drop duplicate keys only in CPython >=3.7
    # when identical; guard against a paste error shrinking the registry.
    assert len(q) >= 201, len(q)
