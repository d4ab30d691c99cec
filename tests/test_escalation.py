"""Match-escalation chain EXACT → UNSPLIT → PARTIAL with hit threshold
(grn_ii_sel, reference lib/ii.c:6659-6721; threshold default 0 per
configure.ac:434).  Levels ACCUMULATE with OR score-sum, they don't
replace."""

import pytest
from pyspark.sql import functions as F

ROWS = [
    (1, "fast merge sort here"),
    (2, "the fastest path wins"),
    (3, "plain unrelated words"),
    (4, "rare token appears"),
    (5, "rarest of them all"),
]


@pytest.fixture(scope="module")
def eng(spark):
    from groonga_spark import SearchEngine

    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    e = SearchEngine.build(docs, ["text"], tokenizer="delimit")
    e.index.persist()
    return e


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_exact_zero_escalates_unsplit_prefix(eng):
    # 'fas' is no token → EXACT 0 → UNSPLIT: whole string 'fas' as lexicon
    # key, prefix-expanded → fast + fastest
    out, n = eng.select_with_count("fas", k=10, escalate=True)
    assert _ids(out) == [1, 2]
    assert n == 2


def test_multiword_falls_through_to_partial(eng):
    # EXACT: fast AND zq → zq has df 0 → 0 hits.  UNSPLIT: 'fast zq' is no
    # term prefix → 0.  PARTIAL: fast* OR zq* → docs 1, 2.
    out, n = eng.select_with_count("fast zq", k=10, escalate=True)
    assert _ids(out) == [1, 2]
    assert n == 2


def test_threshold_accumulates_not_replaces(eng):
    # 'rare' matches doc 4 exactly (1 hit <= threshold 5) → UNSPLIT rare*
    # adds doc 5 AND sums doc 4's exact + expanded scores (GRN_OP_OR
    # accumulation, not replacement)
    base, n0 = eng.select_with_count("rare", k=10, escalate=False)
    assert n0 == 1
    base_score = {r["doc_id"]: r["score"] for r in base.collect()}
    out, n = eng.select_with_count("rare", k=10, escalate=True, escalation_threshold=5)
    assert _ids(out) == [4, 5]
    assert n == 2
    esc_score = {r["doc_id"]: r["score"] for r in out.collect()}
    assert esc_score[4] > base_score[4]  # exact + prefix-expansion summed


def test_no_escalation_above_threshold(eng):
    # threshold 0 (default): 1 exact hit means NO escalation
    out, n = eng.select_with_count("rare", k=10, escalate=True)
    assert _ids(out) == [4]
    assert n == 1


def test_explicit_syntax_never_escalates(eng):
    out, n = eng.select_with_count('"zq zz"', k=10, escalate=True)
    assert n == 0 and _ids(out) == []


def test_force_exact_pragma_disables_escalation(eng):
    # *X (expr.c:5526-5531): EXACT mode only.  'fas' would escalate to
    # [1, 2] (see above); under *X it must return nothing, whatever the
    # threshold says.
    out, n = eng.select_with_count("*X fas", k=10, escalate=True)
    assert n == 0 and _ids(out) == []
    out2, n2 = eng.select_with_count(
        "*Xrare", k=10, escalate=True, escalation_threshold=5
    )
    assert _ids(out2) == [4] and n2 == 1  # glued body, no UNSPLIT step


def test_query_expander_prefix_substitution(eng):
    # QueryExpanderTSV: substitutions may themselves be prefix patterns
    out, n = eng.select_with_count(
        "fast", escalate=False, query_expander={"fast": ["fas*"]}
    )
    assert _ids(out) == [1, 2] and n == 2  # fast + fastest
    # non-matching terms pass through unexpanded
    out2, n2 = eng.select_with_count(
        "rare", escalate=False, query_expander={"fast": ["fas*"]}
    )
    assert _ids(out2) == [4] and n2 == 1


def test_n_hits_uncapped_by_k(eng):
    # k=1 page, but n_hits reports the full match count
    out, n = eng.select_with_count("the", k=1, escalate=False)
    assert len(out.collect()) == 1
    assert n == eng.index.dictionary.filter(F.col("term") == "the").collect()[0]["df"]
