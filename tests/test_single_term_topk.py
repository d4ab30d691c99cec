"""Single-term block-max pruning (engine._single_term_topk) identity:
below SINGLE_TERM_PRUNE_CUTOFF the term decodes outright (one job); with
the cutoff forced off, the two-phase covering-pick + θ-survivor path must
return the identical top-k.  Both arms compared against prune=False."""

import pytest

from groonga_spark.query import engine as eng_mod


@pytest.fixture(scope="module")
def engine(spark, corpus):
    from groonga_spark.query.engine import SearchEngine

    e = SearchEngine.build(corpus, ["content"], tokenizer="code")
    e.index.persist()
    return e


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


@pytest.mark.parametrize("term", ["merge", "index", "partition"])
@pytest.mark.parametrize("k", [1, 5, 50])
def test_two_phase_identity(engine, term, k, monkeypatch):
    plain = _rows(engine.select(term, k=k, escalate=False, prune=False))
    small = _rows(engine.select(term, k=k, escalate=False))  # small-df path
    monkeypatch.setattr(eng_mod, "SINGLE_TERM_PRUNE_CUTOFF", -1)
    two_phase = _rows(engine.select(term, k=k, escalate=False))
    assert plain == small == two_phase
    assert plain


def test_small_path_skips_theta_phase(engine, monkeypatch):
    # θ (and its driver collects) only exists in the two-phase branch —
    # below the cutoff it must never run; with the cutoff off it must
    hits = []
    orig = eng_mod._theta_slack

    def spy(theta):
        hits.append(theta)
        return orig(theta)

    monkeypatch.setattr(eng_mod, "_theta_slack", spy)
    engine.select("merge", k=5, escalate=False).collect()
    assert hits == []
    monkeypatch.setattr(eng_mod, "SINGLE_TERM_PRUNE_CUTOFF", -1)
    # k=1: the covering pick trims to one block but doesn't exhaust the
    # term, so phase 2 (and θ) must run
    engine.select("merge", k=1, escalate=False).collect()
    assert len(hits) == 1
