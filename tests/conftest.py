from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.001"  # fast local gate; driver uses sf0.01


@pytest.fixture(scope="session")
def spark():
    from geospatial_data_lake_spark.session import get_spark

    spark = get_spark(app_name="gdl-tests", cpus="8", driver_memory="8g")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
