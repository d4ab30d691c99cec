"""Query-syntax column operators (get_word_ expr.c:5722-5826, get_op
expr.c:5493-5538) and leading pragmas (*E/*D/*W/*S/*T, expr.c:5592-5639)."""

import pytest
from pyspark.sql import functions as F

ROWS = [
    # doc_id, text, lang, n_chars, source
    (1, "spark table scan fast", "en", 100, "src1"),
    (2, "spark key order merge", "en", 250, "src2"),
    (3, "langue differente ici spark", "fr", 300, "src1"),
    (4, "key order without the word", "en", 350, "other"),
    (5, "nothing relevant here", "fr", 500, "src9"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, n_chars long, source string"
    )


@pytest.fixture(scope="module")
def eng(docs):
    from groonga_spark import SearchEngine

    e = SearchEngine.build(docs, ["text"], tokenizer="delimit")
    e.index.persist()
    return e


@pytest.fixture(scope="module")
def eng2(docs):
    # WITH_SECTION index: sid 1 = source, sid 2 = text
    from groonga_spark import SearchEngine

    e = SearchEngine.build(docs, ["source", "text"], tokenizer="delimit")
    e.index.persist()
    return e


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


class TestColumnOps:
    def test_equal_and_term(self, eng):
        assert _ids(eng.select("lang:en spark", escalate=False)) == [1, 2]

    def test_not_equal(self, eng):
        assert _ids(eng.select("lang:!en spark", escalate=False)) == [3]

    def test_numeric_range(self, eng):
        # colop-only query (no fulltext term at all)
        assert _ids(eng.select("n_chars:>=250 n_chars:<500", escalate=False)) == [2, 3, 4]
        assert _ids(eng.select("n_chars:<150", escalate=False)) == [1]
        assert _ids(eng.select("n_chars:>350", escalate=False)) == [5]
        assert _ids(eng.select("n_chars:<=100", escalate=False)) == [1]

    def test_match_indexed_section_scores_bm25(self, eng):
        # text:@spark routes through the index and keeps BM25 scores —
        # identical frame to the bare term query
        a = {(r["doc_id"], r["score"]) for r in eng.select("text:@spark", escalate=False).collect()}
        b = {(r["doc_id"], r["score"]) for r in eng.select("spark", escalate=False).collect()}
        assert a == b

    def test_match_phrase_value(self, eng):
        assert _ids(eng.select('text:@"key order"', escalate=False)) == [2, 4]

    def test_match_unindexed_substring(self, eng):
        assert _ids(eng.select("source:@rc1", escalate=False)) == [1, 3]

    def test_prefix_scan_unindexed(self, eng):
        assert _ids(eng.select("source:^src", escalate=False)) == [1, 2, 3, 5]

    def test_prefix_indexed_expansion(self, eng):
        # text:^me expands over the lexicon (merge) — BM25-scored
        assert _ids(eng.select("text:^mer", escalate=False)) == [2]

    def test_suffix(self, eng):
        assert _ids(eng.select("source:$c1", escalate=False)) == [1, 3]
        assert _ids(eng.select("text:$rge", escalate=False)) == [2]  # merge

    def test_regexp(self, eng):
        assert _ids(eng.select("text:~sc[a-z]n", escalate=False)) == [1]
        assert _ids(eng.select("lang:~^f", escalate=False)) == [3, 5]

    def test_combined_with_or_group(self, eng):
        got = _ids(eng.select("(n_chars:<150 OR n_chars:>400) spark", escalate=False))
        assert got == [1]


class TestPragmas:
    def test_escalation_threshold_pragma(self, eng):
        # *E with a huge threshold forces UNSPLIT accumulation on top of
        # the exact hit set (same as escalation_threshold kwarg)
        out_kw, n_kw = eng.select_with_count(
            "spark", escalate=True, escalation_threshold=100
        )
        out_pg, n_pg = eng.select_with_count("*E100 spark", escalate=True)
        assert n_kw == n_pg
        assert _ids(out_kw) == _ids(out_pg)

    def test_default_op_or(self, eng):
        assert _ids(eng.select("*DOR merge nothing", escalate=False)) == [2, 5]

    def test_default_op_and_not(self, eng):
        assert _ids(eng.select("*D- spark fast", escalate=False)) == [2, 3]

    def test_weights_pragma(self, eng2):
        # *W2:1 = text-only: matches 'spark' wherever text has it
        assert _ids(eng2.select("*W2 spark", escalate=False)) == [1, 2, 3]
        # *W1:1 = source-only: 'src1' is a source token, not a text token
        assert _ids(eng2.select("*W1 src1", escalate=False)) == [1, 3]
        assert _ids(eng2.select("*W1 spark", escalate=False)) == []

    def test_similar_pragma_matches_api(self, eng):
        api = {r["doc_id"] for r in eng.similar_search("key order merge", max_terms=2).collect()}
        prag = {r["doc_id"] for r in eng.select('*S"key order merge"', escalate=False).collect()}
        # *S uses the default max_terms=(n>>3)+1=1 → subset of api's 2-term set
        assert prag <= api and prag

    def test_term_extract_pragma(self, eng):
        # *T: docs containing any lexicon term present in the text
        got = _ids(eng.select("*T spark zzznotaword", escalate=False))
        assert got == [1, 2, 3]

    def test_bad_pragmas_raise(self, eng):
        from groonga_spark.query.parser import QueryParseError

        with pytest.raises(QueryParseError):
            eng.select("*Exy spark", escalate=False)
        with pytest.raises(QueryParseError):
            eng.select("*DNOPE spark", escalate=False)


class TestQueryFlags:
    """--query_flags (grn_expr_parse flags, include/groonga/expr.h:79;
    select default ALLOW_PRAGMA|ALLOW_COLUMN, proc.c:5087)."""

    def test_allow_leading_not(self, eng):
        # reference injects all_records() before the AND_NOT
        # (expr.c:5917-5924); without the flag a leading '-' is an error
        out, n = eng.select_with_count(
            "-spark", query_flags="ALLOW_PRAGMA|ALLOW_COLUMN|ALLOW_LEADING_NOT"
        )
        assert _ids(out) == [4, 5] and n == 2
        from groonga_spark.query.parser import QueryParseError

        with pytest.raises(QueryParseError):
            eng.select_with_count("-spark")

    def test_no_allow_column_treats_colop_as_text(self, eng):
        # lang:en parses as a plain term under NONE → tokenizes to no
        # indexed term → 0 hits instead of a lang filter
        out, n = eng.select_with_count(
            "lang:en spark", query_flags="NONE", escalate=False
        )
        assert n == 0
        out2, n2 = eng.select_with_count("lang:en spark", escalate=False)
        assert n2 == 2  # default flags: colop applies

    def test_no_allow_pragma_keeps_star_words_literal(self, eng):
        # *DOR is body text under ALLOW_COLUMN only → its tokens match
        # nothing → whole AND clause has a 0-df term → 0 hits
        out, n = eng.select_with_count(
            "*DOR merge nothing", query_flags="ALLOW_COLUMN", escalate=False
        )
        assert n == 0

    def test_unknown_flag_raises(self, eng):
        from groonga_spark.query.parser import QueryParseError

        with pytest.raises(QueryParseError):
            eng.select_with_count("spark", query_flags="ALLOW_NOPE")
