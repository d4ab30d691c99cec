import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from groonga_spark.session import get_spark

    s = get_spark("groonga_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    from groonga_spark.corpus import make_corpus_rows

    return make_corpus_rows(200, seed=42)


@pytest.fixture(scope="session")
def corpus(spark, corpus_rows):
    from groonga_spark.corpus import corpus_df

    df = corpus_df(spark, 200, seed=42).persist()
    df.count()
    return df
