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
    """highlight_html (proc.c:5961): wrap keyword occurrences.  Uses
    literal replace (no regex metachar surprises).  Multi-keyword /
    custom-tag / escaping variants: :func:`highlight_full`."""
    return F.replace(col, F.lit(keyword), F.lit(open_tag + keyword + close_tag))


def highlight_full(
    col,
    keywords: "list[str]",
    open_tag: str = '<span class="keyword">',
    close_tag: str = "</span>",
    html_escape: bool = False,
) -> Column:
    """highlight_full (proc.c:6045): multiple keywords, caller-chosen
    open/close tags, optional HTML escaping of the source text first
    (grn_text_escape analogue).  Keywords apply longest-first so a keyword
    that is a prefix of another never shadows it.  Pinned deviation from
    the reference's normalizer-aware scan: matching is exact-literal (the
    engine normalizes text at index time, so post-top-k highlighting sees
    already-normalized text); a keyword occurring inside an inserted tag
    is not re-protected."""
    c = _col(col)
    if html_escape:
        for raw, esc in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")):
            c = F.replace(c, F.lit(raw), F.lit(esc))
    for kw in sorted(keywords, key=len, reverse=True):
        c = F.replace(c, F.lit(kw), F.lit(open_tag + kw + close_tag))
    return c


def snippet_html_multi(
    col,
    keywords: "list[str]",
    width: int = 60,
    max_fragments: int = 3,
    open_tag: str = '<span class="keyword">',
    close_tag: str = "</span>",
) -> Column:
    """Multi-keyword, multi-fragment KWIC snippet (lib/snip.c:368-756):
    one window per keyword's FIRST occurrence (up to ``max_fragments``),
    every keyword highlighted inside every fragment; absent keywords yield
    no fragment.  Returns ``array<string>`` like the reference's
    snippet vector.  Pure Column expressions — meant to run AFTER top-k on
    k rows, but cheap enough for a full scan (codegen'd).

    Pinned deviation: the reference windows over ALL occurrences with a
    byte budget; we window over first-occurrence-per-keyword, which keeps
    the expression closed-form (and DuckDB-oracle-able)."""
    c = _col(col)
    frags = []
    for kw in keywords[:max_fragments]:
        pos = F.locate(kw, c)
        start = F.greatest(F.lit(1), pos - F.lit(width // 2))
        frag = F.substring(c, start.cast("int"), F.lit(width + len(kw)).cast("int"))
        for k2 in sorted(keywords, key=len, reverse=True):
            frag = F.replace(frag, F.lit(k2), F.lit(open_tag + k2 + close_tag))
        frags.append(F.when(pos > 0, frag))
    return F.filter(F.array(*frags), lambda x: x.isNotNull())


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
