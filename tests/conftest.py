import shutil

import pytest


@pytest.fixture(scope="session")
def spark():
    from tantivy_spark.session import get_spark

    s = get_spark(app_name="tantivy_spark_tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    p = tmp_path_factory.mktemp("idx")
    yield str(p)
    shutil.rmtree(str(p), ignore_errors=True)
