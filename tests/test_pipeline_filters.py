"""Gopher-style repetition signals and training-set decontamination."""

from pyspark.sql import functions as F

from groonga_spark.ops.dedup import decontaminate
from groonga_spark.ops.textstats import repetition_signals


def test_repetition_flags_templated_text(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
            (3, "ab cd"),  # < 3 words: gram fractions report 0
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert rows[1]["dup_word_frac"] > 0.8
    assert rows[1]["top_bigram_frac"] == 1.0
    assert rows[1]["dup_trigram_frac"] == 1.0
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["top_bigram_frac"] == 0.2  # every bigram unique, 1/5
    assert rows[2]["dup_trigram_frac"] == 0.0
    assert rows[3]["top_bigram_frac"] == 0.0
    assert rows[3]["dup_trigram_frac"] == 0.0


def test_decontaminate_removes_only_overlapping(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "prefix alpha beta gamma delta epsilon suffix"),  # shares a 5-gram
            (2, "totally unrelated words without any overlap here"),
            (3, "alpha beta gamma"),  # shares words but no full 5-gram
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate(docs, bench, n=5).collect()
    )
    assert kept == [2, 3]


def test_decontaminate_short_docs_survive(spark):
    bench = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "a b c d e")], "doc_id long, text string"
    )
    kept = sorted(r["doc_id"] for r in decontaminate(docs, bench, n=5).collect())
    assert kept == [10]
