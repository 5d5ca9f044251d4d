import sys
from pathlib import Path

import pytest

# repo root importable (gdal_spark, __spark_entry__)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gdal_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gdal_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"
