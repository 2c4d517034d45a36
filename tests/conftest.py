import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arnab_spark.spark_utils import get_spark  # noqa: E402

SF_DIR_SMALL = "/root/testdata/sf0.001"
SF_DIR_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("arnab_spark_tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    """Small SF for fast unit-level differential checks."""
    return SF_DIR_SMALL


@pytest.fixture(scope="session")
def sf_dir_medium():
    """The SF the driver's correctness gate uses."""
    return SF_DIR_MEDIUM
