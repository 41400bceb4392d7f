import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apollo_service_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        app_name="apollo-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def small_corpus():
    from apollo_service_spark.sources.corpus import gen_corpus

    return gen_corpus(n_hosts=4, n_pages=120, seed=42)


@pytest.fixture(scope="session")
def small_corpus_spark(spark, small_corpus):
    from apollo_service_spark.sources.corpus import corpus_to_spark

    return corpus_to_spark(spark, small_corpus)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
