"""BM25 scoring — single pinned definition shared by engine, oracle, SQL.

Groonga 5.0.4's default fulltext score is ``(noccur + tscore) * weight``
(lib/ii.c:6537) with pluggable scorers (``scorer_tf_idf``, lib/scorers.c:26).
Per the north star we pin **Okapi BM25** (k1=1.2, b=0.75, Lucene-style
non-negative idf) as the default scorer, float64 throughout:

    idf(N, df)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfc(tf, dl, avgdl)= tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score(doc)        = sum over query terms of weight * idf * tfc

``avgdl`` is always computed as exact-integer total_tokens / N so every
implementation (Spark, DuckDB oracle, pure-Python oracle) sees bitwise-equal
inputs.  Ties break by doc_id ascending (rank identity, SURVEY §2.7).
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_component(tf: float, dl: float, avgdl: float) -> float:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def bm25(tf: float, df: int, n_docs: int, dl: float, avgdl: float) -> float:
    return idf(n_docs, df) * tf_component(tf, dl, avgdl)


def bm25_col(tf_col, df_col, n_docs: int, dl_col, avgdl: float):
    """Catalyst Column expression of the same formula (JVM-side, no UDF)."""
    from pyspark.sql import functions as F

    idf_c = F.log(1.0 + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))
    tfc = (tf_col * (K1 + 1.0)) / (tf_col + K1 * (1.0 - B + B * dl_col / F.lit(float(avgdl))))
    return idf_c * tfc


def bm25_sql(tf_expr: str, df_expr: str, n_docs_expr: str, dl_expr: str, avgdl_expr: str) -> str:
    """The same formula as an ANSI-SQL snippet (DuckDB oracle)."""
    return (
        f"ln(1.0 + ({n_docs_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5)) * "
        f"(({tf_expr}) * {K1 + 1.0}) / "
        f"(({tf_expr}) + {K1} * (1.0 - {B} + {B} * ({dl_expr}) / ({avgdl_expr})))"
    )
