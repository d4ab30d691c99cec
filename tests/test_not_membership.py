"""AND_NOT membership-only negative decode (engine.NEG_DOCS_ONLY):
results must be identical to the scored-decode path in every shape —
simple negative, term on both sides, leading NOT, nested/compound
negatives (which must NOT take the fast path)."""

import pytest
from pyspark.sql import functions as F

from groonga_spark.query import engine as eng_mod
from groonga_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def eng(corpus):
    e = SearchEngine.build(corpus, ["content"], tokenizer="code")
    e.index.persist()
    return e


def _both(eng, query, **kw):
    old = eng_mod.NEG_DOCS_ONLY
    try:
        eng_mod.NEG_DOCS_ONLY = True
        fast = [tuple(r) for r in eng.select(query, k=20, escalate=False, **kw).collect()]
        eng_mod.NEG_DOCS_ONLY = False
        slow = [tuple(r) for r in eng.select(query, k=20, escalate=False, **kw).collect()]
    finally:
        eng_mod.NEG_DOCS_ONLY = old
    return fast, slow


@pytest.mark.parametrize(
    "query",
    [
        "merge -sort",                # simple negative (fast path)
        "merge -sort -partition",     # two negatives
        "merge sort -partition",      # AND positive, simple negative
        "merge OR sort -partition",   # OR positive
        '"merge sort" -partition',    # phrase positive
        "merge -merge",               # same term both sides → empty
        'merge -"sort partition"',    # phrase negative → general path
    ],
)
def test_fast_path_rank_identical(eng, query):
    fast, slow = _both(eng, query)
    assert fast == slow, query
    if query == "merge -merge":
        assert fast == []


def test_term_on_both_sides_not_excluded_from_scoring(eng):
    # 'sort' scores positively in one branch and negates another — it must
    # stay in the scored set (only PURE negatives skip it)
    fast, slow = _both(eng, "sort OR (merge -sort)")
    assert fast == slow
    # and equals plain 'sort' here: (merge -sort) contributes no docs that
    # don't contain sort... actually it contributes docs with merge and
    # without sort; just assert non-empty and identical across arms
    assert len(fast) > 0


def test_leading_not_unaffected(eng):
    fast, slow = _both(eng, "-merge", query_flags="ALLOW_LEADING_NOT")
    assert fast == slow
    assert len(fast) > 0
