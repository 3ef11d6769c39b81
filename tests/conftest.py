import pytest

from kafka_firehose_nozzle_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kfn-spark-tests", shuffle_partitions=4)
    yield s
