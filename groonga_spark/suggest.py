"""Suggest family — completion / correction / suggestion (reference
plugins/suggest/suggest.c, the three GRN_SUGGEST_TYPE_* modes).

The reference ranks against tables learned from query logs; this
re-expression ranks against the corpus itself, deterministically:

* ``complete``  — prefix completion over the LEXICON, ranked by document
  frequency (the reference's _key prefix search on the item table ranked
  by _score≈frequency).  A dictionary range scan, no full pass.
* ``correct``   — typo correction: lexicon terms within edit distance
  ``max_distance``, ranked (distance, df desc, term).  The levenshtein
  scan is prefiltered by ``abs(len(term) - len(input)) <= max_distance``
  (a length-band predicate that pushes down) — the reference's
  similar-search over the item table.
* ``suggest``   — related terms by document co-occurrence: terms sharing
  documents with the input term, ranked by co-occurring doc count (the
  reference's co-occurrence pair table, built from logs).  Expressed as
  one token explode + semi-join; the 100 TB deployment precomputes the
  (term_a, term_b, n) pair table offline with the same plan and serves
  suggestions from it — this function IS that build restricted to one
  term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def complete(engine, prefix: str, k: int = 10) -> DataFrame:
    """(term, df) — top-k lexicon completions of ``prefix`` by df."""
    return (
        engine.index.dictionary.filter(F.col("term").startswith(prefix))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def correct(engine, word: str, max_distance: int = 2, k: int = 10) -> DataFrame:
    """(term, df, distance) — top-k lexicon terms within
    ``max_distance`` edits of ``word``, ranked (distance, df desc, term)."""
    n = len(word)
    d = F.levenshtein(F.col("term"), F.lit(word))
    return (
        engine.index.dictionary.filter(
            (F.length("term") >= n - max_distance)
            & (F.length("term") <= n + max_distance)
        )
        .withColumn("distance", d.cast("long"))
        .filter(F.col("distance") <= max_distance)
        .select("term", "df", "distance")
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def suggest_cooccur(
    df: DataFrame,
    word: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, n) — top-k terms by number of documents co-occurring with
    ``word``.  One explode + distinct + semi-join + groupBy; at scale,
    materialize the full (a, b, n) pair frame once and range-query it."""
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    with_word = toks.filter(F.col("term") == word).select("id")
    return (
        toks.join(with_word, "id", "left_semi")
        .filter(F.col("term") != word)
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(k)
    )
