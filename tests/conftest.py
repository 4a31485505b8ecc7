from __future__ import annotations

import pytest

from tax_compliance_engine_spark.dims import load_dims
from tax_compliance_engine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="tce-spark-tests", master="local[4]", shuffle_partitions=4
    )
    yield spark


@pytest.fixture(scope="session")
def dims(spark):
    return load_dims(spark)
