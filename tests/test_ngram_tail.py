"""GET-mode trailing-gram correction for split n-gram tokenizers (ADVICE
r1): a query's final short gram is only indexed at run ENDS, so phrase-
matching it produced false negatives for mid-run substrings.  The tail is
redundant given the preceding gram → dropped; a lone short token becomes
prefix-matchable (the reference GET cursor's prefix treatment)."""

import pytest


ROWS = [
    (1, "qabcz"),      # 'abc' occurs MID-RUN: grams qa,ab,bc,cz,z
    (2, "abc"),        # run ends exactly: ab,bc,c
    (3, "xabq"),       # 'ab' but not 'abc'
    (4, "zzz"),
    (5, "qrs"),        # 'q' starts a gram here too (qr)
]


@pytest.fixture(scope="module")
def eng(spark):
    from groonga_spark import SearchEngine

    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    e = SearchEngine.build(docs, ["text"], tokenizer="bigram_split_symbol_alpha")
    e.index.persist()
    return e


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_midrun_substring_query_matches(eng):
    # r1 emitted ab,bc,c for 'abc'; doc 1 has no 'c' token mid-run →
    # false negative.  With the tail dropped (ab,bc phrase) both match.
    assert _ids(eng.select("abc", escalate=False)) == [1, 2]


def test_two_char_query_unchanged(eng):
    assert _ids(eng.select("ab", escalate=False)) == [1, 2, 3]


def test_single_char_query_prefix_expands(eng):
    # 'q' alone: token 'q' is never indexed mid-run; prefix expansion over
    # q* grams (qa in doc 1, qr in doc 5; trailing 'q' in doc 3)
    assert _ids(eng.select("q", escalate=False)) == [1, 3, 5]


def test_oracle_parity(spark):
    from oracle.pyoracle import OracleEngine, OracleIndex

    rows = [{"doc_id": i, "text": t} for i, t in ROWS]
    oeng = OracleEngine(OracleIndex.build(rows, ["text"], "bigram_split_symbol_alpha"))
    assert sorted(d for d, _ in oeng.select("abc", k=10)) == [1, 2]
    assert sorted(d for d, _ in oeng.select("q", k=10)) == [1, 3, 5]
