"""The anchor-driven block prune (rare required term's doc-grid cells
restrict every other term's block decode — the distributed analogue of
grn_ii_cursor_set_min rid skipping, ii.c:4144-4172) is an EXACT rewrite:
result sets and scores must be identical with the prune forced on vs
disabled, for every plan shape whose required-token analysis admits an
anchor.  The gates are monkeypatched so the prune fires on the 200-doc
test corpus where the defaults would leave it off."""

import pytest

from groonga_spark.query import engine as eng_mod
from groonga_spark.query.engine import _required_tokens


@pytest.fixture(scope="module")
def engine(spark, corpus):
    from groonga_spark.query.engine import SearchEngine

    e = SearchEngine.build(corpus, ["content"], tokenizer="code")
    e.index.persist()
    return e


def _rows(df):
    return sorted((r["doc_id"], round(r["score"], 6)) for r in df.collect())


def _force(monkeypatch):
    monkeypatch.setattr(eng_mod, "ANCHOR_PRUNE_CUTOFF", -1)
    monkeypatch.setattr(eng_mod, "ANCHOR_PRUNE_RATIO", 0)
    monkeypatch.setattr(eng_mod, "ANCHOR_PRUNE_COVERAGE", 0)
    monkeypatch.setattr(eng_mod, "ANCHOR_PRUNE_POS_ONLY", False)


QUERIES = [
    "merge sort",  # And of two terms
    "merge sort partition",  # And of three
    "merge -sort",  # Not: anchor from the positive side prunes the negative
    '"merge sort partition"',  # phrase atom (all tokens required)
    "*N5 merge partition",  # NEAR atom
    '"merge sort" OR merge',  # Or whose branches BOTH require 'merge'
    "merge sc*",  # And(term, prefix): anchor=merge prunes every expansion
    "merge sort OR merge partition",  # nested And/Or, 'merge' required
]


@pytest.mark.parametrize("query", QUERIES)
def test_prune_identity(engine, query, monkeypatch):
    plain = _rows(engine.select(query, k=50, escalate=False, prune=False))
    _force(monkeypatch)
    pruned = _rows(engine.select(query, k=50, escalate=False))
    assert plain == pruned
    assert plain  # queries must actually match on the test corpus


def test_prune_actually_fires(engine, monkeypatch):
    _force(monkeypatch)
    fired = []
    orig = eng_mod.SearchEngine._anchor_pruned_blocks

    def spy(self, blocks, anchor):
        fired.append(anchor)
        return orig(self, blocks, anchor)

    monkeypatch.setattr(eng_mod.SearchEngine, "_anchor_pruned_blocks", spy)
    engine.select("merge sort", k=5, escalate=False).collect()
    assert len(fired) == 1


def test_prune_identity_with_count(engine, monkeypatch):
    # n_hits comes from counting the pruned frame — must stay the exact
    # total match count, not a candidate superset
    _, n_plain = engine.select_with_count(
        "merge sort", k=5, escalate=False, prune=False
    )
    _force(monkeypatch)
    _, n_pruned = engine.select_with_count("merge sort", k=5, escalate=False)
    assert n_plain == n_pruned > 5


def test_prune_identity_tf_scorer(engine, monkeypatch):
    # the prune is scorer-agnostic (exact rewrite, not a bm25 bound)
    plain = _rows(
        engine.select("merge sort", k=50, scorer="tf", escalate=False, prune=False)
    )
    _force(monkeypatch)
    pruned = _rows(engine.select("merge sort", k=50, scorer="tf", escalate=False))
    assert plain == pruned and plain


def test_no_anchor_for_or_of_disjoint_terms(engine, monkeypatch):
    # Or(a, b) requires neither a nor b — the prune must NOT fire, and
    # results are unchanged either way
    _force(monkeypatch)
    plain = _rows(engine.select("merge OR sort", k=50, escalate=False, prune=False))
    pruned = _rows(engine.select("merge OR sort", k=50, escalate=False))
    assert plain == pruned and plain


def test_required_tokens_analysis():
    import groonga_spark.query.parser as qp
    from groonga_spark.query.engine import _Atom

    t = lambda x: _Atom(tokens=[x], offsets=[0], kind="term")
    ph = _Atom(tokens=["a", "b"], offsets=[0, 1], kind="phrase")
    pfx = _Atom(tokens=["p"], offsets=[0], kind="prefix")
    assert _required_tokens(qp.And([t("a"), t("b")])) == {"a", "b"}
    assert _required_tokens(qp.Or([t("a"), t("b")])) == set()
    assert _required_tokens(qp.Or([ph, qp.And([t("a"), t("c")])])) == {"a"}
    assert _required_tokens(qp.Not(t("a"), t("b"))) == {"a"}
    assert _required_tokens(qp.And([pfx, t("a")])) == {"a"}
    assert _required_tokens(pfx) == set()
