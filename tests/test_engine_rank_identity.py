"""End-to-end rank-identity: Spark engine vs pure-Python oracle.

Mirrors the reference's `.test`/`.expected` golden convention
(test/command/suite/select/**, SURVEY §5): every query's (doc_id, score)
list must be identical — same docs, same order, scores equal to 1e-9."""

import pytest

from oracle.pyoracle import OracleEngine, OracleIndex

QUERIES = [
    # (query, match_columns, k) — mirrors FIXTURES.md F4
    ("index", None, 10),
    ("merge", None, 10),
    ("index query", None, 10),          # AND, df-ordered
    ("index OR query", None, 10),       # OR sum-scores
    ("index -query", None, 10),         # AND_NOT
    ('"quick brown fox"', None, 10),    # planted phrase
    ('"merge sort partition"', None, 10),
    ("inde*", None, 10),                # prefix expansion
    ("*N5 merge partition", None, 10),  # NEAR window
    ("snake_case", None, 5),            # multi-token word → phrase semantics
]


@pytest.fixture(scope="module")
def engine(corpus):
    from groonga_spark import SearchEngine

    eng = SearchEngine.build(corpus, ["content"], tokenizer="bigram")
    eng.index.persist()
    return eng


@pytest.fixture(scope="module")
def oracle(corpus_rows):
    rows = [
        {"doc_id": i + 1, "content": r[4]}
        for i, r in enumerate(
            sorted(corpus_rows, key=lambda x: (x[0], x[1]))
        )
    ]
    return OracleEngine(OracleIndex.build(rows, ["content"], "bigram"))


@pytest.mark.parametrize("query,mc,k", QUERIES)
def test_rank_identity(engine, oracle, query, mc, k):
    got = [
        (r["doc_id"], r["score"])
        for r in engine.select(query, mc, k=k, escalate=False).collect()
    ]
    want = oracle.select(query, mc, k=k)
    assert [d for d, _ in got] == [d for d, _ in want], (
        f"doc order mismatch for {query!r}: {got} vs {want}"
    )
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9, f"score mismatch doc {gd}: {gs} vs {ws}"


def test_doc_ids_match_corpus_order(corpus, corpus_rows):
    rows = corpus.orderBy("doc_id").select("repo", "path").collect()
    want = sorted((r[0], r[1]) for r in corpus_rows)
    assert [(r["repo"], r["path"]) for r in rows] == want


def test_content_sha_invariant(corpus):
    """Per-row sha256(content) must be preserved through the pipeline
    (BASELINE.json input_hint invariant)."""
    import hashlib

    rows = corpus.select("content", "content_sha").collect()
    for r in rows:
        assert hashlib.sha256(r["content"].encode()).hexdigest() == r["content_sha"]
