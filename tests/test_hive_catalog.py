"""Hive-metastore smoke: the catalog operations against a REAL Hive
(Derby) metastore, not just Spark's in-memory catalog — external
partitioned table DDL, MSCK recovery, DESCRIBE location, per-partition
ANALYZE, and the schema-preserving location swap.

Body lives in tests/hive_scripts.py (HIVE_SMOKE); all Hive scenarios
share one subprocess session — Hive support must be enabled at session
build and the suite's shared session is in-memory-catalog."""

from __future__ import annotations

import pytest

from tests.conftest import assert_hive_markers

# Slow lane: the shared Derby+Hive subprocess fixture is ~60 s of JVM
# bring-up — the single heaviest item in the suite. All catalog
# scenarios still run, in the slow lane, every session
# (`pytest tests/ -m slow`).
pytestmark = pytest.mark.slow


def test_catalog_ops_against_hive_metastore(hive_golden_stdout):
    assert_hive_markers(hive_golden_stdout, "HIVE_SMOKE_PASS")


def test_full_load_missing_previous_location(hive_golden_stdout):
    """FullLoadTest.scala:165-198 'Previous lake table location folder
    does not exist': the swap load succeeds over a catalog entry whose
    files are gone, re-points the table and preserves the schema."""
    assert_hive_markers(hive_golden_stdout, "FULL_LOAD_MISSING_LOC_PASS")


def test_full_load_cleans_table_root_leftovers(hive_golden_stdout):
    """FullLoadTest.scala:301-363: stray version dirs and $folder$
    markers at the table root are cleansed after a successful swap load;
    only the new location survives and the data matches."""
    assert_hive_markers(hive_golden_stdout, "FULL_LOAD_LEFTOVERS_PASS")


def test_full_load_flat_layout_siblings_survive(hive_golden_stdout):
    """Session-review regression: leftover cleanup must not run on a
    flat-layout table — sibling datasets at the same root survive a
    table-mode FullLoad."""
    assert_hive_markers(hive_golden_stdout, "FULL_LOAD_FLAT_LAYOUT_SAFE_PASS")
