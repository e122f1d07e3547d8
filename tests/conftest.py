import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fabric_claims_spark.session import get_spark  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running scale-evidence tests"
    )


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("fabric-claims-tests", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    """Smallest driver-generated corpus (fast enough for unit tests)."""
    return "/root/testdata/sf0.001"
