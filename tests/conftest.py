from __future__ import annotations

import pytest

from data_ingestion_lambda_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4, extra_conf={"spark.default.parallelism": "4"})
    yield s


SF_SMOKE = "/root/testdata/sf0.001"
