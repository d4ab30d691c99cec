"""Driver-side XXH64 must agree with Spark's xxhash64 for every term
shape the tokenizers can emit — pbucket pruning is only sound if the
two hashes agree exactly."""

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from groonga_spark.hashutil import term_pbucket, xxh64_signed


@pytest.fixture(scope="module")
def hash_rows(spark):
    terms = [
        "",
        "a",
        "ab",
        "spark",
        "hello world",
        "x" * 3,
        "x" * 4,
        "x" * 7,
        "x" * 8,
        "x" * 31,
        "x" * 32,
        "x" * 33,
        "x" * 100,
        "日本語テキスト",
        "καλημέρα",
        "merge_sort_partition",
        "\x00\x01",
        "🎉🎊",
    ]
    df = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term",
        F.xxhash64("term").alias("h"),
        F.pmod(F.xxhash64("term"), F.lit(64)).cast("int").alias("pb"),
    )
    return {r["term"]: (r["h"], r["pb"]) for r in df.collect()}


def test_xxh64_matches_spark(hash_rows):
    for term, (h, pb) in hash_rows.items():
        assert xxh64_signed(term) == h, term
        assert term_pbucket(term, 64) == pb, term


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_xxh64_pure_python_properties(s):
    # deterministic, signed-long range
    v = xxh64_signed(s)
    assert -(1 << 63) <= v < (1 << 63)
    assert v == xxh64_signed(s)
    assert 0 <= term_pbucket(s, 64) < 64
