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
