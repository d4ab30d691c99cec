"""Tokenizer/normalizer goldens — mirrors the reference's
``suite/tokenize`` / ``suite/normalize`` fixture style (SURVEY §5, F5)."""

from groonga_spark.normalize import normalize
from groonga_spark.tokenize import tokenize, tokenize_batch


def toks(text, mode="bigram"):
    return tokenize(text, mode)


def test_normalize_ascii():
    assert normalize("Hello  World") == "hello world"
    assert normalize("A\tB\nC") == "a b c"
    assert normalize("x\x01y") == "x y"


def test_bigram_alpha_digit_symbol_runs():
    # runs of same class -> one token each (uni_alpha/digit/symbol=1,
    # tokenizers.c:312-313); '_' is SYMBOL (normalizer.c:823-836)
    assert toks("abc123") == [("abc", 0), ("123", 1)]
    assert toks("snake_case") == [("snake", 0), ("_", 1), ("case", 2)]
    assert toks("a+b") == [("a", 0), ("+", 1), ("b", 2)]
    assert toks("x == 42") == [("x", 0), ("==", 1), ("42", 2)]


def test_bigram_blank_breaks_runs():
    assert toks("ab cd") == [("ab", 0), ("cd", 1)]
    # blank between same-class runs still splits
    assert toks("ab  cd") == [("ab", 0), ("cd", 1)]


def test_bigram_lowercases():
    assert toks("FooBar") == [("foobar", 0)]
    assert toks("DEF Foo(X)") == [
        ("def", 0), ("foo", 1), ("(", 2), ("x", 3), (")", 4)
    ]


def test_bigram_cjk_overlapping():
    # non-ASCII letters: overlapping bigrams + trailing unigram
    got = toks("日本語")
    assert got == [("日本", 0), ("本語", 1), ("語", 2)]


def test_delimit():
    assert toks("the quick  brown", "delimit") == [
        ("the", 0), ("quick", 1), ("brown", 2)
    ]


def test_code_tokenizer_snake():
    # '_' consumed; segments one position each; full identifier emitted at
    # first segment's position when multi-segment
    got = toks("snake_case", "code")
    assert ("snake", 0) in got and ("case", 1) in got
    assert ("snake_case", 0) in got
    assert len(got) == 3


def test_code_tokenizer_camel():
    got = toks("getUserName", "code")
    assert ("get", 0) in got and ("user", 1) in got and ("name", 2) in got
    assert ("getusername", 0) in got


def test_code_tokenizer_acronym():
    got = toks("HTTPServer", "code")
    assert ("http", 0) in got and ("server", 1) in got
    assert ("httpserver", 0) in got


def test_code_tokenizer_plain_words_unchanged():
    got = toks("return foo + 1", "code")
    assert got == [("return", 0), ("foo", 1), ("+", 2), ("1", 3)]


def test_code_tokenizer_digits_in_identifier():
    got = toks("sha256sum", "code")
    # segments sha, 256, sum + full identifier
    assert ("sha", 0) in got and ("256", 1) in got and ("sum", 2) in got
    assert ("sha256sum", 0) in got


def test_code_leading_underscore():
    got = toks("_private", "code")
    assert ("private", 0) in got


def test_batch_matches_single():
    texts = ["snake_case foo", "getUser(42)", "", "x"]
    batch = tokenize_batch(texts, "code")
    for t, b in zip(texts, batch):
        single = tokenize_batch([t], "code")[0]
        assert single == b


def test_positions_are_dense_bigram():
    terms, poss = tokenize_batch(["def foo(bar, baz):"], "bigram")[0]
    assert poss == list(range(len(terms)))
