"""SQLRunner golden-parity test against the reference's own fixture.

Replays SQLRunnerTest.scala "Data can be loaded from source to target
with full mode": the reference's params.json swap sequence (DROP swap →
CREATE LIKE at new timestamped location → dynamic-partition INSERT →
DROP old → RENAME swap) executed verbatim against a real Hive (Derby)
metastore, with the fixture's hard-coded /tmp/tests root substituted
for the test dir.

Body lives in tests/hive_scripts.py (SQL_RUNNER); all Hive scenarios
share one subprocess session."""

from __future__ import annotations

import pytest

from tests.conftest import assert_hive_markers

# Slow lane: consumes the ~60 s Derby+Hive subprocess fixture.
pytestmark = pytest.mark.slow


def test_sql_runner_swap_sequence_golden(hive_golden_stdout):
    assert_hive_markers(hive_golden_stdout, "SQL_RUNNER_GOLDEN_PASS")
