"""Pluggable-tokenizer contract: a hypothetical TokenMecab drop-in
(dictionary-driven longest-match Japanese segmenter as the stand-in —
the real mecab library is absent from this sandbox) must route through
the registry (tokenize.register_tokenizer — the GRN_PROC_TOKENIZER
surface, lib/tokenizers.c:779-828 / plugins/tokenizers/mecab.c:1) into
BOTH the tokenize command path and the full index-build + query path,
including the executor-side UDF (closure capture via
resolve_tokenizer)."""

import pytest

from groonga_spark.tokenize import (
    register_tokenizer,
    resolve_tokenizer,
    tokenize,
    tokenize_batch,
    unregister_tokenizer,
)

def _make_fake_mecab():
    # built as a CLOSURE (not a module-level function) so cloudpickle
    # ships it by value into executor processes — exactly what a real
    # plugin package would rely on --py-files for
    vocab = sorted(
        ["東京都", "東京", "京都", "に", "住む", "検索", "電気", "自動車", "は", "速い"],
        key=len,
        reverse=True,
    )

    def fake_mecab(texts):
        out = []
        for t in texts:
            t = t or ""
            terms, poss, i, p = [], [], 0, 0
            while i < len(t):
                if t[i].isspace():
                    i += 1
                    continue
                for w in vocab:
                    if t.startswith(w, i):
                        terms.append(w)
                        poss.append(p)
                        i += len(w)
                        p += 1
                        break
                else:  # unknown char → single-char token (mecab unk handling)
                    terms.append(t[i])
                    poss.append(p)
                    i += 1
                    p += 1
            out.append((terms, poss))
        return out

    return fake_mecab


_fake_mecab = _make_fake_mecab()


@pytest.fixture()
def plugin():
    register_tokenizer("fake_mecab", _fake_mecab)
    yield
    unregister_tokenizer("fake_mecab")


def test_registry_hygiene(plugin):
    # duplicate registration fails loudly; overwrite is explicit
    with pytest.raises(ValueError, match="already registered"):
        register_tokenizer("fake_mecab", _fake_mecab)
    register_tokenizer("fake_mecab", _fake_mecab, overwrite=True)
    # builtin names are protected
    with pytest.raises(ValueError, match="builtin"):
        register_tokenizer("bigram", _fake_mecab)
    with pytest.raises(TypeError):
        register_tokenizer("notfn", "nope")
    # resolution: plugin name → its callable; builtin name → the name
    assert resolve_tokenizer("fake_mecab") is _fake_mecab
    assert resolve_tokenizer("delimit") == "delimit"


def test_tokenize_command_routes_through_plugin(plugin):
    assert tokenize("東京都に住む", "fake_mecab") == [
        ("東京都", 0),
        ("に", 1),
        ("住む", 2),
    ]
    got = tokenize_batch(["電気自動車は速い", ""], "fake_mecab")
    assert got[0] == (["電気", "自動車", "は", "速い"], [0, 1, 2, 3])
    assert got[1] == ([], [])


def test_index_build_and_query_through_plugin(spark, plugin):
    # end-to-end: build an index with the plugin tokenizer (the UDF runs
    # on executors — the callable must ship in the closure) and answer a
    # query whose GET-mode tokenize also routes through the plugin
    from groonga_spark import SearchEngine

    docs = spark.createDataFrame(
        [
            (1, "東京都に住む"),
            (2, "京都に住む"),
            (3, "電気自動車は速い"),
        ],
        "doc_id long, text string",
    )
    eng = SearchEngine.build(docs, ["text"], tokenizer="fake_mecab")
    # '東京都' segments to the single dict token → matches doc 1 only
    # (NOT doc 2: '京都' is a different lexicon key, the classic
    # morphological-vs-ngram distinction mecab exists for)
    hits = sorted(r.doc_id for r in eng.select("東京都", k=10, escalate=False).collect())
    assert hits == [1]
    hits2 = sorted(r.doc_id for r in eng.select("住む", k=10, escalate=False).collect())
    assert hits2 == [1, 2]
    # dictionary terms present in the built lexicon
    terms = {r.term for r in eng.index.dictionary.select("term").collect()}
    assert {"東京都", "京都", "住む", "電気"} <= terms


def test_unknown_tokenizer_still_fails(spark):
    with pytest.raises(ValueError, match="unknown tokenizer"):
        tokenize_batch(["x"], "no_such_tokenizer")
