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


def test_partition_spec_value_reference_unit_cases():
    """RecoverPartitionsCustomTest's createParameterValue contract:
    strings quote, short/int stay bare, booleans raise ('not supported
    Value'); NULL maps to the addressable default-partition spec (the
    documented divergence — this engine's writers produce NULL
    partitions legitimately)."""
    import pytest

    from m3d_engine_spark.sources.catalog import partition_spec_value

    assert partition_spec_value("theValue") == "'theValue'"
    assert partition_spec_value(2) == "2"
    assert partition_spec_value(4) == "4"
    assert partition_spec_value(None) == "'__HIVE_DEFAULT_PARTITION__'"
    with pytest.raises(TypeError, match="unsupported partition value"):
        partition_spec_value(False)
    # quoting safety the reference's UDF never had
    assert partition_spec_value("O'Brien") == "'O''Brien'"


def test_generate_add_partition_statements_reference_unit_case():
    """RecoverPartitionsCustomTest 'HiveQL statements Generation': the
    3-row country/district dataset yields exactly the reference's
    expected statements (modulo the engine's ', ' spec separator)."""
    from m3d_engine_spark.sources.catalog import generate_add_partition_statements

    criteria = [
        [("country", "portugal"), ("district", "porto")],
        [("country", "germany"), ("district", "herzogenaurach")],
        [("country", "portugal"), ("district", "coimbra")],
    ]
    got = {s.replace(", ", ",") for s in
           generate_add_partition_statements("test", criteria)}
    assert got == {
        "ALTER TABLE test ADD IF NOT EXISTS PARTITION(country='portugal',district='porto')",
        "ALTER TABLE test ADD IF NOT EXISTS PARTITION(country='germany',district='herzogenaurach')",
        "ALTER TABLE test ADD IF NOT EXISTS PARTITION(country='portugal',district='coimbra')",
    }
