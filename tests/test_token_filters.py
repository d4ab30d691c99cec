"""Token filters (§2.9) + NEAR2: Porter stem goldens (official Porter
output forms), TokenFilterStem at ADD+GET, TokenFilterStopWord at GET only
(stop_word.c:143), and the *n (NEAR2, no offset correction) pragma."""

import pytest
from pyspark.sql import functions as F

from groonga_spark import SearchEngine
from groonga_spark.stem import stem

PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "digitizer": "digit", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "effective": "effect", "probate": "probat",
    "rate": "rate", "controlling": "control", "rolling": "roll",
    "running": "run", "generalization": "gener",
}


def test_porter_goldens():
    bad = {w: (stem(w), exp) for w, exp in PORTER_VECTORS.items() if stem(w) != exp}
    assert not bad, bad


@pytest.fixture(scope="module")
def small_docs(spark):
    rows = [
        (1, "running runs run fast"),
        (2, "the quick brown fox jumps"),
        (3, "walked walking walker spark"),
        (4, "the spark engine is fast"),
        (5, "alpha beta gamma delta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stem_filter_add_and_get(spark, small_docs):
    eng = SearchEngine.build(
        small_docs, ["text"], tokenizer="delimit", n_pbuckets=2,
        token_filters=("stem",),
    )
    # index side: dictionary holds stems, not surface forms
    terms = {r["term"] for r in eng.index.dictionary.collect()}
    assert "run" in terms and "running" not in terms
    assert "walk" in terms and "walked" not in terms
    # query side: surface-form query stems to the same key
    hits = eng.select("runs", k=5, escalate=False).collect()
    assert [r["doc_id"] for r in hits] == [1]
    # tf merged across the three surface forms
    from groonga_spark.query.decode import decoded_postings

    blocks = eng._filtered_blocks(["run"], {})
    rows = decoded_postings(blocks, with_pos=False).collect()
    assert {(r["doc_id"], r["tf"]) for r in rows} == {(1, 3)}


def test_stopword_filter_get_only(spark, small_docs):
    stop = frozenset({"the", "is"})
    eng = SearchEngine.build(
        small_docs, ["text"], tokenizer="delimit", n_pbuckets=2,
        token_filters=("stopword",), stopwords=stop,
    )
    plain = SearchEngine.build(small_docs, ["text"], tokenizer="delimit", n_pbuckets=2)
    # GET: 'the' dropped from the query → same result as bare 'spark'
    a = [(r["doc_id"], round(r["score"], 9)) for r in eng.select("the spark", k=5, escalate=False).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in eng.select("spark", k=5, escalate=False).collect()]
    assert a == b and len(a) == 2
    # ADD unaffected: 'the' is still indexed (GET-only filter)
    assert eng.index.dictionary.filter(F.col("term") == "the").count() == 1
    # and scores match the unfiltered engine for the surviving token
    c = [(r["doc_id"], round(r["score"], 9)) for r in plain.select("spark", k=5, escalate=False).collect()]
    assert a == c


def test_near2_no_offset(spark, small_docs):
    eng = SearchEngine.build(small_docs, ["text"], tokenizer="delimit", n_pbuckets=2)
    # doc 5: alpha(0) beta(1) gamma(2)
    # NEAR (*N1): corrected positions alpha-0=0, gamma-1=1 → span 1 ≤ 1 → hit
    assert [r["doc_id"] for r in eng.select("*N1 alpha gamma", k=5, escalate=False).collect()] == [5]
    # NEAR (*N0): span 1 > 0 → miss
    assert eng.select("*N0 alpha gamma", k=5, escalate=False).count() == 0
    # NEAR2 (*n2): raw positions 0,2 → span 2 ≤ 2 → hit
    assert [r["doc_id"] for r in eng.select("*n2 alpha gamma", k=5, escalate=False).collect()] == [5]
    # NEAR2 (*n1): span 2 > 1 → miss
    assert eng.select("*n1 alpha gamma", k=5, escalate=False).count() == 0
