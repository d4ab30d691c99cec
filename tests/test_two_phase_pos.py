"""The two-phase positional decode (tf-only scoring pass + positions
restricted to candidate blocks) must be invisible: phrase and NEAR
results are identical whichever side of POS_TWO_PHASE_CUTOFF the query
lands on.  The cutoff is monkeypatched to 0 to force the two-phase path
on a small corpus where the default would stay single-phase."""

import pytest

from groonga_spark.query import engine as eng_mod


@pytest.fixture(scope="module")
def engine(spark, corpus):
    from groonga_spark.query.engine import SearchEngine

    e = SearchEngine.build(corpus, ["content"], tokenizer="code")
    e.index.persist()
    return e


def _rows(df):
    return sorted(
        (r["doc_id"], round(r["score"], 6)) for r in df.collect()
    )


@pytest.mark.parametrize(
    "query",
    [
        '"merge sort partition"',  # planted phrase
        '"quick brown fox jumps"',
        "*N5 merge partition",  # NEAR
        "merge sort",  # non-positional control
    ],
)
def test_two_phase_matches_single_phase(engine, query, monkeypatch):
    single = _rows(engine.select(query, k=20, escalate=False))
    monkeypatch.setattr(eng_mod, "POS_TWO_PHASE_CUTOFF", 0)
    double = _rows(engine.select(query, k=20, escalate=False))
    assert single == double
    assert single  # planted phrases / head terms must actually match


def test_two_phase_with_sections_and_tf_scorer(engine, monkeypatch):
    # the tf scorer's per-occurrence phrase scoring consumes the same
    # restricted pos_rows — counts must survive the candidate filter
    single = _rows(
        engine.select('"merge sort partition"', k=20, scorer="tf", escalate=False)
    )
    monkeypatch.setattr(eng_mod, "POS_TWO_PHASE_CUTOFF", 0)
    double = _rows(
        engine.select('"merge sort partition"', k=20, scorer="tf", escalate=False)
    )
    assert single == double and single


def test_two_phase_mixed_plan(engine, monkeypatch):
    # phrase OR plain term: candidates are computed PER positional atom,
    # so the term atom's docs must not be constrained by the phrase's
    q = '"merge sort partition" OR buffer'
    single = _rows(engine.select(q, k=50, escalate=False))
    monkeypatch.setattr(eng_mod, "POS_TWO_PHASE_CUTOFF", 0)
    double = _rows(engine.select(q, k=50, escalate=False))
    assert single == double and single


def test_rarest_first_engages_and_is_identical(engine, monkeypatch):
    # the pos_only single-atom gate must actually take the rarest-first
    # masked-decode branch (not silently fall through) AND return
    # rank-identical results.  Spy on decoded_postings' cand_global.
    from groonga_spark.query import engine as em

    single = _rows(engine.select('"merge sort partition"', k=20, escalate=False))
    seen = {"cand": 0}
    real = em.decoded_postings

    def spy(blocks, with_pos, with_block=False, cand_col=None, cand_global=None):
        if cand_global is not None:
            seen["cand"] += 1
            assert len(cand_global) > 0
        return real(blocks, with_pos, with_block=with_block,
                    cand_col=cand_col, cand_global=cand_global)

    monkeypatch.setattr(em, "POS_TWO_PHASE_CUTOFF", 0)
    monkeypatch.setattr(em, "decoded_postings", spy)
    masked = _rows(engine.select('"merge sort partition"', k=20, escalate=False))
    assert seen["cand"] == 1  # exactly one masked decode (the non-rare terms)
    assert single == masked and single


def test_rarest_first_near_and_weights(spark, corpus, monkeypatch):
    # NEAR through the masked path, under a sectioned index with
    # restricted match_columns weights (contrib-null filtering must not
    # interact with the doc-level candidate mask)
    from groonga_spark.query.engine import SearchEngine
    from groonga_spark.query import engine as em

    df = corpus.withColumn("title", corpus["content"].substr(1, 64))
    e = SearchEngine.build(df, ["title", "content"], tokenizer="code")
    e.index.persist()
    for q in ("*N5 merge partition", '"merge sort partition"'):
        for mc in (None, "content", "title*3||content"):
            single = _rows(e.select(q, k=20, escalate=False, match_columns=mc))
            monkeypatch.setattr(em, "POS_TWO_PHASE_CUTOFF", 0)
            masked = _rows(e.select(q, k=20, escalate=False, match_columns=mc))
            monkeypatch.setattr(em, "POS_TWO_PHASE_CUTOFF", 200_000)
            assert single == masked, (q, mc)
