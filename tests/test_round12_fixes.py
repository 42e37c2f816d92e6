"""Regression tests for the round-11 ADVICE findings.

Pins: the FuzzyDedup CLI dial validators reject JSON booleans —
``bool`` is an ``int`` subclass, so ``{"salt_size": true}`` would
otherwise coerce to ``int(True) == 1``, silently setting a threshold
that salts nearly every bucket (huge replication overhead) instead of
flagging the config typo; ``{"max_bucket_size": true}`` would likewise
cap every bucket at one row.
"""

import pytest

from m3d_engine_spark.config import ParamsFile
from m3d_engine_spark.operators.fuzzy_dedup import (
    _positive_or_none,
    _salt_size_param,
)


@pytest.mark.parametrize("bad", [True, False])
def test_salt_size_rejects_json_boolean(bad):
    p = ParamsFile({"salt_size": bad})
    with pytest.raises(ValueError, match="salt_size"):
        _salt_size_param(p)


@pytest.mark.parametrize("bad", [True, False])
def test_positive_or_none_rejects_json_boolean(bad):
    p = ParamsFile({"max_bucket_size": bad})
    with pytest.raises(ValueError, match="max_bucket_size"):
        _positive_or_none(p, "max_bucket_size")


def test_salt_size_valid_forms_unchanged():
    assert _salt_size_param(ParamsFile({})) == "auto"
    assert _salt_size_param(ParamsFile({"salt_size": "auto"})) == "auto"
    assert _salt_size_param(ParamsFile({"salt_size": "off"})) is None
    assert _salt_size_param(ParamsFile({"salt_size": None})) is None
    assert _salt_size_param(ParamsFile({"salt_size": 64})) == 64
    assert _salt_size_param(ParamsFile({"salt_size": "64"})) == 64


def test_fse_parse_conditions_forms():
    """select_conditions accepts the reference's "col=value" strings
    (FixedSizeStringExtractorConfiguration.scala:95-99) and structured
    pairs; malformed strings raise."""
    import pytest

    from m3d_engine_spark.operators.fixed_size_extractor import parse_conditions

    assert parse_conditions(["year=2019", "month = 2"]) == [
        ("year", "2019"),
        ("month", "2"),
    ]
    assert parse_conditions([["year", 2019]]) == [("year", 2019)]
    with pytest.raises(ValueError, match="Wrong select condition"):
        parse_conditions(["year2019"])


def test_fse_parse_select_rules_date_arithmetic():
    """select_rules shift today by named periods and emit the criteria
    for the resulting date (FixedSizeStringExtractorConfiguration
    .scala:101-137): calendar-month clamping, ISO week, and the
    reference's period-must-be-a-partition check."""
    import datetime as dt

    import pytest

    from m3d_engine_spark.operators.fixed_size_extractor import parse_select_rules

    today = dt.date(2019, 3, 31)
    assert parse_select_rules(
        ["month-1"], ["year", "month", "day"], today
    ) == [("year", "2019"), ("month", "2"), ("day", "28")]
    assert parse_select_rules(["year+1"], ["year", "month"], today) == [
        ("year", "2020"),
        ("month", "3"),
    ]
    # ISO week pairing: 2019-01-01 is ISO week 1
    assert parse_select_rules(
        ["week-1"], ["year", "week"], dt.date(2019, 1, 8)
    ) == [("year", "2019"), ("week", "1")]
    with pytest.raises(ValueError, match="Unsupported period"):
        parse_select_rules(["day-1"], ["year", "month"], today)
    with pytest.raises(ValueError, match="Wrong select rule"):
        parse_select_rules(["fortnight-1"], ["year", "month", "day"], today)
    with pytest.raises(ValueError, match="Unsupported partitioning schema"):
        parse_select_rules(["day+0"], ["day"], today)
