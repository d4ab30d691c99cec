"""Block-max WAND for disjunctive top-k (engine._wand_or_topk) must be
rank-identical to the unpruned full_outer OR evaluation: every top-k doc
keeps ALL its blocks through both pruning levels (the WAND bound and the
BMW cell bound), so its score is exact, and every doc that loses a block
has true score < θ.  The df cutoff is monkeypatched so the path fires on
the 200-doc test corpus."""

import pytest

from groonga_spark.query import engine as eng_mod


@pytest.fixture(scope="module")
def engine(spark, corpus):
    from groonga_spark.query.engine import SearchEngine

    e = SearchEngine.build(corpus, ["content"], tokenizer="code")
    e.index.persist()
    return e


def _force(monkeypatch):
    monkeypatch.setattr(eng_mod, "WAND_OR_CUTOFF", -1)


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


QUERIES = [
    "merge OR sort",
    "merge OR sort OR partition",
    "merge OR qzqzqz",  # one branch matches nothing
    "the OR merge",  # head term + rare term (classic WAND win shape)
]


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("k", [1, 5, 50])
def test_wand_identity(engine, query, k, monkeypatch):
    plain = _rows(engine.select(query, k=k, escalate=False, prune=False))
    _force(monkeypatch)
    pruned = _rows(engine.select(query, k=k, escalate=False))
    assert plain == pruned
    assert plain


def test_wand_actually_fires(engine, monkeypatch):
    _force(monkeypatch)
    fired = []
    orig = eng_mod.SearchEngine._wand_or_topk

    def spy(self, tokens, term_meta, weights, k):
        fired.append(sorted(tokens))
        return orig(self, tokens, term_meta, weights, k)

    monkeypatch.setattr(eng_mod.SearchEngine, "_wand_or_topk", spy)
    engine.select("merge OR sort", k=5, escalate=False).collect()
    assert fired == [["merge", "sort"]]


def test_wand_skips_cell_refinement_above_meta_cap(engine, monkeypatch):
    # level-1-only path (huge corpora): still rank-identical
    _force(monkeypatch)
    monkeypatch.setattr(eng_mod, "WAND_CELL_MAX_META", -1)
    plain = _rows(engine.select("merge OR sort", k=10, escalate=False, prune=False))
    pruned = _rows(engine.select("merge OR sort", k=10, escalate=False))
    assert plain == pruned


def test_wand_not_used_when_count_needed(engine, monkeypatch):
    # select_with_count must keep the exact-n_hits path: the WAND frame is
    # a candidate superset and may not be counted
    _force(monkeypatch)

    def boom(self, *a, **kw):  # pragma: no cover
        raise AssertionError("WAND path must not fire when counting hits")

    monkeypatch.setattr(eng_mod.SearchEngine, "_wand_or_topk", boom)
    _, n = engine.select_with_count("merge OR sort", k=5, escalate=False)
    assert n > 5


def test_wand_not_used_for_duplicate_branches(engine, monkeypatch):
    # 'merge OR merge' double-counts in the reference OR semantics — the
    # single-decode WAND path would halve the score, so it must fall through
    _force(monkeypatch)

    def boom(self, *a, **kw):  # pragma: no cover
        raise AssertionError("WAND path must not fire for duplicate tokens")

    monkeypatch.setattr(eng_mod.SearchEngine, "_wand_or_topk", boom)
    plain = _rows(engine.select("merge OR merge", k=5, escalate=False, prune=False))
    pruned = _rows(engine.select("merge OR merge", k=5, escalate=False))
    assert plain == pruned
