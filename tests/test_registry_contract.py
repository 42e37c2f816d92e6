"""Registry-wide driver-contract guards.

The round driver canonicalizes each ``queries()`` result with pandas
(sort over all columns, then hash); non-scalar cells (array / struct /
map) are unhashable there and turn a mathematically-correct entry into
a red driver row — exactly what happened to ``kmeans_train`` in round
7 (``CORRECTNESS_r07.json``: ``TypeError: unhashable type: 'list'``)
while the tuple-izing local gate stayed green. The hash is also
dtype-sensitive: a DuckDB column pandas renders as float64 against a
Spark int64 mismatches even with identical values (round 8:
``budget_select``/``kanon_census``/``bpe_pairs`` via uncast
``SUM(BIGINT)`` → HUGEINT). These walks pin the contract the
value-level local gate cannot see: scalar-only Spark schemas, no
HUGEINT oracle columns, and int/float/str family parity between every
Spark output column and its DuckDB oracle twin.

Construction is done ONCE on a thread pool (module-scoped fixture):
building a registry DataFrame is mostly driver-side analysis, and the
handful of entries that run collects at build time (kmeans, pagerank,
calibration) overlap, so the full 201-entry walk costs ~20 s on the
shared session instead of ~95 s serial — cheap enough for the default
lane, which is where a guard against future registry additions has to
live.
"""

from concurrent.futures import ThreadPoolExecutor

import pytest

import __spark_entry__ as entry

_NON_SCALAR = ("array", "struct", "map")


@pytest.fixture(scope="module")
def registry_schemas(spark, sf_dir):
    """name -> [(column, spark typeName)] for every registry entry."""
    queries = entry.queries()

    def schema_of(item):
        name, fn = item
        return name, [
            (f.name, f.dataType.typeName()) for f in fn(spark, sf_dir).schema.fields
        ]

    with ThreadPoolExecutor(max_workers=12) as ex:
        return dict(ex.map(schema_of, queries.items()))


@pytest.fixture(scope="module")
def oracle_described(sf_dir):
    """name -> [(column, duckdb type)] via DESCRIBE (plans, never runs)."""
    import duckdb

    from m3d_engine_spark.sources.testdata import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out = {
        name: [
            (col, typ)
            for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall()
        ]
        for name, sql in entry.oracle_sql().items()
    }
    con.close()
    return out


def test_every_registry_entry_has_scalar_only_schema(registry_schemas):
    bad = [
        (name, col, typ)
        for name, fields in registry_schemas.items()
        for col, typ in fields
        if typ in _NON_SCALAR
    ]
    assert bad == [], (
        "driver canonicalizer cannot hash non-scalar cells; "
        f"explode/flatten these columns: {bad}"
    )


def test_no_oracle_column_types_hugeint(oracle_described):
    """Rule: always ``CAST(SUM(...) AS BIGINT)`` in oracle SQL — window
    sums and every UNION arm included (UNION type-unifies the column).
    The fetchall-based local gate is blind to this class because Python
    ints compare equal regardless of the pandas dtype."""
    bad = [
        (name, col, typ)
        for name, cols in oracle_described.items()
        for col, typ in cols
        if "HUGEINT" in typ.upper()
    ]
    assert bad == [], (
        "pandas renders HUGEINT as float64 and the driver hashes dtypes; "
        f"CAST these oracle columns to BIGINT: {bad}"
    )


def _duck_family(t: str) -> str:
    t = t.upper()
    if any(x in t for x in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")):
        return "int"
    if any(x in t for x in ("DOUBLE", "FLOAT", "REAL", "DECIMAL", "HUGEINT")):
        # HUGEINT/DECIMAL land in pandas as float64 — float family
        return "float"
    if "VARCHAR" in t:
        return "str"
    if "BOOLEAN" in t:
        return "bool"
    return t


def _spark_family(t: str) -> str:
    if t in ("long", "integer", "short", "byte"):
        return "int"
    if t in ("double", "float"):
        return "float"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    return t


def test_oracle_dtype_family_parity(registry_schemas, oracle_described):
    """Column-name sets and int/float/str/bool dtype families must
    match between every Spark output and its DuckDB oracle — the
    pandas-dtype surface the driver's hash actually compares. Catches
    the whole HUGEINT/DECIMAL-vs-long class plus accidental
    int-vs-double divergence for any future entry, before a driver
    round does."""
    problems = []
    for name, cols in oracle_described.items():
        spark_fields = registry_schemas[name]
        d = {c: _duck_family(t) for c, t in cols}
        s = {c: _spark_family(t) for c, t in spark_fields}
        if set(d) != set(s):
            problems.append((name, "columns", sorted(set(d) ^ set(s))))
            continue
        problems.extend(
            (name, c, f"duckdb {d[c]} vs spark {s[c]}")
            for c in d
            if d[c] != s[c]
        )
    assert problems == [], problems


def test_oracle_keys_subset_of_queries_and_no_duplicates():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    # dict literals silently drop duplicate keys only in CPython >=3.7
    # when identical; guard against a paste error shrinking the registry.
    assert len(q) >= 201, len(q)
