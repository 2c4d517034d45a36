import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arnab_spark.spark_utils import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("arnab_spark_tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield spark
