"""WITH_SECTION (multi-column index, weighted match_columns) and the
code-identifier tokenizer, engine vs oracle — mirrors the reference's
``suite/select/match_columns/scorer/*/section`` fixtures (SURVEY §5)."""

import pytest

from oracle.pyoracle import OracleEngine, OracleIndex


@pytest.fixture(scope="module")
def sec_engine(corpus):
    from groonga_spark import SearchEngine

    eng = SearchEngine.build(corpus, ["path", "content"], tokenizer="bigram")
    eng.index.persist()
    return eng


@pytest.fixture(scope="module")
def sec_oracle(corpus_rows):
    rows = [
        {"doc_id": i + 1, "path": r[1], "content": r[4]}
        for i, r in enumerate(sorted(corpus_rows, key=lambda x: (x[0], x[1])))
    ]
    return OracleEngine(OracleIndex.build(rows, ["path", "content"], "bigram"))


SEC_QUERIES = [
    ("module", "path*2||content", 10),
    ("module", "path||content", 10),
    ("file", "path", 10),
    ("index", "content", 10),
]


@pytest.mark.parametrize("query,mc,k", SEC_QUERIES)
def test_sectioned_rank_identity(sec_engine, sec_oracle, query, mc, k):
    got = [
        (r["doc_id"], r["score"])
        for r in sec_engine.select(query, mc, k=k, escalate=False).collect()
    ]
    want = sec_oracle.select(query, mc, k=k)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9


@pytest.fixture(scope="module")
def code_engine(corpus):
    from groonga_spark import SearchEngine

    eng = SearchEngine.build(corpus, ["content"], tokenizer="code")
    eng.index.persist()
    return eng


@pytest.fixture(scope="module")
def code_oracle(corpus_rows):
    rows = [
        {"doc_id": i + 1, "content": r[4]}
        for i, r in enumerate(sorted(corpus_rows, key=lambda x: (x[0], x[1])))
    ]
    return OracleEngine(OracleIndex.build(rows, ["content"], "code"))


CODE_QUERIES = [
    ("merge", None, 10),
    ("getIndex", None, 10),   # single camel identifier → full-token GET
    ("index query", None, 10),
    ("quick brown", None, 10),
]


@pytest.mark.parametrize("query,mc,k", CODE_QUERIES)
def test_code_tokenizer_rank_identity(code_engine, code_oracle, query, mc, k):
    got = [
        (r["doc_id"], r["score"])
        for r in code_engine.select(query, mc, k=k, escalate=False).collect()
    ]
    want = code_oracle.select(query, mc, k=k)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9


def test_escalation_zero_hits(code_engine):
    # a term absent from the corpus escalates to prefix search
    res = code_engine.select("zzznotthere", k=5, escalate=True)
    assert res.count() == 0  # nothing matches even the prefix
