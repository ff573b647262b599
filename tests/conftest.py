import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from kafka_delta_ingest_spark.session import get_spark

    s = get_spark(
        app_name="kdi-tests",
        cores=8,
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g", "spark.sql.warehouse.dir": "/tmp/kdi-warehouse"},
    )
    yield s


@pytest.fixture()
def tmp_table_root(tmp_path):
    return str(tmp_path / "table")
