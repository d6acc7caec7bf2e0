import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semlink.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("semlink-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fx_tiny():
    from semlink.fixtures import generate
    return generate("tiny")


@pytest.fixture(scope="session")
def fx_tiny_dfs(spark, fx_tiny):
    from semlink.fixtures import to_spark
    dfs = to_spark(spark, fx_tiny)
    for df in dfs.values():
        df.cache()
    return dfs
