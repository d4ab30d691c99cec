"""regexp_index_search soundness: the TokenRegexp bigram prefilter must be
a SUPERSET of true matches for every pattern — index-accelerated results
must equal the sequential-scan path exactly (grn_ii_select_regexp,
reference lib/ii.c:6049-6117, only accelerates when a literal is provably
required; everything else falls back to the Onigmo scan)."""

import pytest
from pyspark.sql import functions as F

ROWS = [
    (1, "the foo bird sang"),
    (2, "a bar of soap"),
    (3, "neither word here"),
    (4, "axbcd appears once"),
    (5, "plain bcd token"),
    (6, "foo5bar digits between"),
    (7, "foobar glued together"),
    (8, "spark table scan plan"),
    (9, "scan before spark here"),
    (10, "ab1cd mixed class run"),
    (11, "ab and 1cd separated"),
    (12, "hello world"),
    (13, "helloworld"),
    (14, "sparkling scanner"),
]

# patterns that broke the r1 naive [A-Za-z]+ literal extractor: character
# classes, alternation branches, escapes, quantifiers, mixed-class runs
PATTERNS = [
    "(foo|bar)",      # alternation: nothing required → must scan
    "foo|bar",        # top-level alternation
    "a[xyz]bcd",      # class member 'xyz' is NOT required; 'bcd' is
    "foo\\dbar",      # '\d' escape: 'dbar' is NOT required
    "spark.*scan",    # safe: 'spark' required
    "sc[a-z]n",       # 'sc' required
    "ab1cd",          # mixed alpha/digit: must split runs by class
    "hello?world",    # 'o' optional: 'hell'/'world' required
    "ab?c",           # no literal >= 2 survives → scan
    "x(abc)+y",       # group content not top-level → scan
]


@pytest.fixture(scope="module")
def docs_and_engine(spark):
    from groonga_spark import SearchEngine

    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    eng = SearchEngine.build(docs, ["text"], tokenizer="regexp")
    eng.index.persist()
    return docs, eng


@pytest.mark.parametrize("pattern", PATTERNS)
def test_index_equals_scan(docs_and_engine, pattern):
    docs, eng = docs_and_engine
    scan = sorted(
        r["doc_id"] for r in eng.regexp_search(docs, "text", pattern).collect()
    )
    idx = sorted(
        r["doc_id"]
        for r in eng.regexp_index_search(docs, "text", pattern).collect()
    )
    assert idx == scan, f"pattern {pattern!r}: index {idx} != scan {scan}"


def test_anchored_patterns(docs_and_engine):
    docs, eng = docs_and_engine
    for pattern in ["^spark", "scan$", "\\Ahello", "world\\z"]:
        scan = sorted(
            r["doc_id"]
            for r in eng.regexp_search(docs, "text", pattern).collect()
        )
        idx = sorted(
            r["doc_id"]
            for r in eng.regexp_index_search(docs, "text", pattern).collect()
        )
        assert idx == scan, f"pattern {pattern!r}: index {idx} != scan {scan}"
