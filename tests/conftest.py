from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from octospark.session import get_spark

    s = get_spark(app_name="octospark-tests", master="local[4]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def pages(spark, sf_dir):
    from octospark.sources import build_pages

    df = build_pages(spark, sf_dir).cache()
    df.count()
    return df
