from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ticdc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("TICDC_SPARK_TEST_SF", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("TICDC_SPARK_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ticdc_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
