import pytest


@pytest.fixture(scope="session")
def spark():
    from llm_review_aggregation_spark.session import get_spark

    s = get_spark(app_name="tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
