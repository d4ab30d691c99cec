"""Scalar-function parity with the reference's registered procs
(SURVEY §2.8; reference lib/proc.c:6910-7000, plugins/functions/).

Most map 1:1 onto built-in Column functions — these wrappers exist so the
mapping is explicit, documented, and testable."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def edit_distance(a, b) -> Column:
    """edit_distance(a, b) — proc.c:4790 → levenshtein."""
    return F.levenshtein(a, b)


def between(col, lo, lo_border: str, hi, hi_border: str) -> Column:
    """between(col, lo, 'include'|'exclude', hi, ...) — proc.c:5570."""
    c = _col(col)
    lo_ok = (c >= lo) if lo_border == "include" else (c > lo)
    hi_ok = (c <= hi) if hi_border == "include" else (c < hi)
    return lo_ok & hi_ok


def in_values(col, *values) -> Column:
    """in_values(col, v1, v2, ...) — proc.c:6161."""
    return _col(col).isin(list(values))


def all_records() -> Column:
    """all_records() — proc.c:4829."""
    return F.lit(True)


def vector_size(col) -> Column:
    """vector_size(v) — plugins/functions/vector.c:22."""
    return F.size(col)


def html_untag(col) -> Column:
    """html_untag(text) — proc.c:5294."""
    return F.regexp_replace(col, "<[^>]*>", "")


def highlight_html(col, keyword: str, open_tag: str = '<span class="keyword">', close_tag: str = "</span>") -> Column:
    """highlight_html/highlight_full (proc.c:5961,6045): wrap keyword
    occurrences.  Uses literal replace (no regex metachar surprises)."""
    return F.replace(col, F.lit(keyword), F.lit(open_tag + keyword + close_tag))


def snippet_html(col, keyword: str, width: int = 40) -> Column:
    """snippet_html(col) — KWIC fragment around the first keyword hit with
    the keyword wrapped (lib/snip.c:368,467).  Meant to run AFTER top-k, on
    k rows only — never over the full corpus."""
    pos = F.locate(keyword, col)  # 1-based, 0 if absent
    start = F.greatest(F.lit(1), pos - F.lit(width // 2))
    frag = F.substring(col, start.cast("int"), F.lit(width + len(keyword)).cast("int"))
    return F.when(
        pos > 0,
        F.replace(frag, F.lit(keyword), F.lit('<span class="keyword">' + keyword + "</span>")),
    ).otherwise(F.lit(None))


def normalize_text(col) -> Column:
    """The ``normalize`` command (proc.c:6889) as a column function —
    NormalizerAuto semantics via the vectorized kernel in normalize.py."""
    from pyspark.sql.types import StringType

    from .normalize import normalize as _norm

    # no type hints: `from __future__ import annotations` stringifies them,
    # which pandas_udf can't resolve — pass returnType explicitly instead
    _udf = F.pandas_udf(lambda s: s.fillna("").map(_norm), StringType())
    return _udf(col)


def scorer_tf_idf(tf_col, df_col, n_docs: int) -> Column:
    """scorer_tf_idf (lib/scorers.c:26-52): tf * log(N / df-ish), floored at
    1.0 per the reference's behavior for degenerate stats."""
    v = tf_col * F.log(F.lit(float(n_docs)) / df_col)
    return F.greatest(v, F.lit(1.0))


def scorer_tf_at_most(tf_col, cap: float) -> Column:
    """scorer_tf_at_most(max) (lib/scorers.c:54-88): min(tf, cap)."""
    return F.least(tf_col.cast("double"), F.lit(float(cap)))
