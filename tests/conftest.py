import tempfile

import pytest

from llm_information_extraction_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    warehouse = tempfile.mkdtemp(prefix="kgx_test_warehouse_")
    s = get_spark(
        app_name="kgx-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
