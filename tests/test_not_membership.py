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


SEC_ROWS = [
    # the negated term 'sort' appears ONLY in doc 3's `path` section;
    # with match_columns restricted to `content`, `-sort` must not
    # exclude doc 3 (the reference scopes negated terms to the matched
    # sections too)
    (1, "alpha", "merge sort"),
    (2, "beta", "merge tree"),
    (3, "sort", "merge heap"),
    (4, "gamma", "other things"),
]


@pytest.fixture(scope="module")
def sec_eng(spark):
    e = SearchEngine.build(
        spark.createDataFrame(
            SEC_ROWS, "doc_id long, path string, content string"
        ),
        ["path", "content"],
        tokenizer="delimit",
    )
    e.index.persist()
    return e


@pytest.mark.parametrize("mc", ["content", "path||content", None])
def test_restricted_match_columns_sections(sec_eng, mc):
    fast, slow = _both(sec_eng, "merge -sort", match_columns=mc)
    assert fast == slow, mc
    ids = sorted(d for d, _ in fast)
    if mc == "content":
        # doc 1 excluded (sort in content); doc 3 KEPT (sort only in
        # the unmatched path section) — the r3 fast path over-excluded it
        assert ids == [2, 3]
    else:
        # all-section weights: sort in either section excludes
        assert ids == [2]


def test_restricted_sections_weighted_pragma(sec_eng):
    # *W2 == match only section 2 (content); same scoping rule
    fast, slow = _both(sec_eng, "*W2 merge -sort")
    assert fast == slow
    assert sorted(d for d, _ in fast) == [2, 3]
