import pytest


@pytest.fixture(scope="session")
def spark():
    from osmgraft.session import get_spark

    s = get_spark(app_name="osmgraft-tests", cores=4,
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
