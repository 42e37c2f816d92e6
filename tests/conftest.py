import os

import pytest

from m3d_engine_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="m3d-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "4",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def multiset_equal(df_a, df_b) -> bool:
    """Order-insensitive multiset compare — the reference's golden-data
    checker (TestUtils.scala:10-24): groupBy(all cols).count on both
    sides, symmetric difference must be empty."""
    a = df_a.groupBy(*df_a.columns).count()
    b = df_b.groupBy(*df_b.columns).count()
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
