"""Golden replay of the reference's three INTEGRATION suites — the
last reference test directory not yet covered:

* RecoverPartitionsCustomIntegrationTest.scala:16 — AppendLoad with
  ``metadata_update_strategy: SparkRecoverPartitionsCustom`` (typed
  ADD PARTITION), asserting table content, SHOW PARTITIONS state,
  per-partition ANALYZE statistics, and header persistence.
* RecoverPartitionsNativeIntegrationTest.scala:16 — same fixture with
  the native (MSCK) strategy.
* FailFastIntegrationTest.scala:28 — FullLoad in FAILFAST reader mode:
  a good load populates table + partitions; a malformed file must fail
  the pipeline while leaving table data AND partition metadata intact.

Bodies live in tests/hive_scripts.py (INTEGRATION); all Hive scenarios
share one subprocess session (SHOW PARTITIONS / DESCRIBE ... PARTITION
statistics need a real metastore). Fixture data is read from the
read-only reference checkout at runtime — never copied into the repo.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import assert_hive_markers
from tests.hive_scripts import INTEGRATION_REF

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(INTEGRATION_REF),
        reason="reference fixtures not present",
    ),
    # Slow lane: consumes the ~60 s Derby+Hive subprocess fixture.
    pytest.mark.slow,
]


def test_recover_partitions_custom_golden(hive_golden_stdout):
    assert_hive_markers(hive_golden_stdout, "SparkRecoverPartitionsCustom_PASS")


def test_recover_partitions_native_golden(hive_golden_stdout):
    assert_hive_markers(hive_golden_stdout, "SparkRecoverPartitionsNative_PASS")


def test_failfast_integration_golden(hive_golden_stdout):
    assert_hive_markers(hive_golden_stdout, "FAILFAST_PASS")
