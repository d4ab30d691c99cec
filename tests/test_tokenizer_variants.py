"""TokenBigram variant family (§2.9; lib/tokenizers.c:307-345,799-822):
uni_* flags, IgnoreBlank, Unigram/Trigram, TokenDelimitNull."""

from groonga_spark.tokenize import ALL_TOKENIZERS, tokenize_batch


def tok(text, mode):
    return tokenize_batch([text], mode)[0][0]


class TestVariants:
    def test_plain_bigram_ascii_whole_runs(self):
        assert tok("ab_c XY 12", "bigram") == ["ab", "_", "c", "xy", "12"]

    def test_unigram_trigram_ascii_same_as_bigram(self):
        # uni_alpha/digit/symbol = 1 for all three: ASCII runs stay whole
        base = tok("ab_c XY 12", "bigram")
        assert tok("ab_c XY 12", "unigram") == base
        assert tok("ab_c XY 12", "trigram") == base

    def test_split_symbol(self):
        # symbol runs n-gram'd; alpha/digit runs stay whole
        assert tok("a +-* b", "bigram_split_symbol") == ["a", "+-", "-*", "*", "b"]
        assert tok("a +-* b", "bigram") == ["a", "+-*", "b"]

    def test_split_symbol_alpha(self):
        assert tok("abc 12", "bigram_split_symbol_alpha") == ["ab", "bc", "c", "12"]

    def test_split_symbol_alpha_digit(self):
        assert tok("abc 123", "bigram_split_symbol_alpha_digit") == [
            "ab", "bc", "c", "12", "23", "3",
        ]

    def test_ignore_blank_fuses_runs(self):
        assert tok("ab cd", "bigram_ignore_blank") == ["abcd"]
        assert tok("ab cd", "bigram") == ["ab", "cd"]
        # class change still breaks the fused run
        assert tok("ab 12 cd", "bigram_ignore_blank") == ["ab", "12", "cd"]

    def test_ignore_blank_split(self):
        assert tok("ab cd", "bigram_ignore_blank_split_symbol_alpha") == [
            "ab", "bc", "cd", "d",
        ]

    def test_cjk_ngram_sizes(self):
        assert tok("日本語", "bigram") == ["日本", "本語", "語"]
        assert tok("日本語", "unigram") == ["日", "本", "語"]
        assert tok("日本語です", "trigram") == ["日本語", "本語で", "語です", "です", "す"]

    def test_delimit_null(self):
        assert tok("a b\x00c d", "delimit_null") == ["a b", "c d"]

    def test_positions_sequential(self):
        terms, poss = tokenize_batch(["abc 12"], "bigram_split_symbol_alpha")[0]
        assert poss == list(range(len(terms)))

    def test_registry_has_all_reference_variants(self):
        # 10 ngram tokenizers + 3 raw (no-normalizer) modes + delimit ×2
        # + normalized whole-value + code + TokenRegexp
        assert len(ALL_TOKENIZERS) == 18

    def test_regexp_sentinels(self):
        from groonga_spark.tokenize import REGEXP_BEGIN, REGEXP_END

        terms, poss = __import__("groonga_spark.tokenize", fromlist=["x"]).tokenize_batch(
            ["ab cd"], "regexp"
        )[0]
        assert terms[0] == REGEXP_BEGIN and terms[-1] == REGEXP_END
        assert terms[1:-1] == ["ab", "b", "cd", "d"]
        assert poss == [0, 1, 2, 3, 4, 5]
        # empty text still carries both sentinels
        t2, p2 = __import__("groonga_spark.tokenize", fromlist=["x"]).tokenize_batch(
            [""], "regexp"
        )[0]
        assert t2 == [REGEXP_BEGIN, REGEXP_END] and p2 == [0, 1]

    def test_batch_mixed_ascii_unicode(self):
        res = tokenize_batch(["abc", "日本 ab"], "bigram_split_symbol_alpha")
        assert res[0][0] == ["ab", "bc", "c"]
        assert res[1][0] == ["日本", "本", "ab", "b"]
