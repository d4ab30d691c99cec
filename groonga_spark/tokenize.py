"""Tokenizers, re-expressed as vectorized batch kernels.

Semantics follow Groonga's tokenizer suite (reference
``lib/tokenizers.c:348-455`` ``ngram_next`` for TokenBigram and variants,
``lib/tokenizers.c:224-236`` for TokenDelimit), over NormalizerAuto
character classes (see :mod:`groonga_spark.normalize`):

* ``bigram`` — TokenBigram with uni_alpha/uni_digit/uni_symbol = 1: maximal
  runs of same-class ALPHA/DIGIT/SYMBOL characters become ONE token each;
  blanks break runs and emit nothing; non-ASCII letter runs become
  overlapping character bigrams (skip=1) with a trailing unigram.
  Position = emitted-token index (Groonga's sequential token position).
* ``delimit`` — TokenDelimit: split on blanks only.
* ``code`` — our code-aware identifier tokenizer (the north-star addition,
  consistent with the ALPHA-run semantics of normalizer.c:823-836): alpha
  runs split at camelCase humps; ``_`` inside identifiers is consumed (not
  emitted); each segment takes one position; multi-segment identifiers
  additionally emit the full lowercased identifier at the position of their
  first segment, so both ``getUserName`` and ``get user name`` queries hit.

All tokenizers are implemented over one concatenated byte buffer per Arrow
batch — boundary detection is pure numpy; only the final substring
extraction loops in Python (over tokens, not characters).

The pure-Python oracle imports these same functions, so engine and oracle
share tokenization by construction; rank-identity tests then only exercise
scoring/top-k independence.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from .normalize import (
    ALPHA,
    BLANK,
    CLS_LUT,
    DIGIT,
    IS_LOWER,
    IS_UPPER,
    LOWER_LUT,
    NONASCII,
    SYMBOL,
    char_class,
)
import unicodedata

TOKENIZERS = ("bigram", "delimit", "code")

# The reference registers 8 TokenBigram variants plus Unigram/Trigram
# (lib/tokenizers.c:307-345,799-822): ngram size n, per-class "uni_*" flags
# (1 = a whole same-class run is ONE token; 0 = the run splits into
# overlapping n-grams with skip=1 and shortened tail), and ignore_blank
# (blanks neither break runs nor emit).  Params: (n, split_classes,
# ignore_blank) where split_classes ⊆ {ALPHA, DIGIT, SYMBOL}.
_NGRAM_VARIANTS: dict[str, tuple[int, tuple, bool]] = {
    "unigram": (1, (), False),
    "bigram": (2, (), False),
    "trigram": (3, (), False),
    "bigram_split_symbol": (2, ("symbol",), False),
    "bigram_split_symbol_alpha": (2, ("symbol", "alpha"), False),
    "bigram_split_symbol_alpha_digit": (2, ("symbol", "alpha", "digit"), False),
    "bigram_ignore_blank": (2, (), True),
    "bigram_ignore_blank_split_symbol": (2, ("symbol",), True),
    "bigram_ignore_blank_split_symbol_alpha": (2, ("symbol", "alpha"), True),
    "bigram_ignore_blank_split_symbol_alpha_digit": (
        2,
        ("symbol", "alpha", "digit"),
        True,
    ),
    # raw modes: an n-gram lexicon with NO normalizer has no character
    # classes at all — case-sensitive sliding n-grams over the raw text,
    # blanks included, positions = char offsets
    # (table_create/default_tokenizer/bigram/default,
    # select/query_expander/column/*/quoted_or)
    "unigram_raw": (1, ("symbol", "alpha", "digit"), False),
    "bigram_raw": (2, ("symbol", "alpha", "digit"), False),
    "trigram_raw": (3, ("symbol", "alpha", "digit"), False),
}

ALL_TOKENIZERS = (
    "delimit", "delimit_null", "delimit_null_norm", "code", "regexp",
    *_NGRAM_VARIANTS,
)

# ---------------------------------------------------------------------------
# Pluggable tokenizer registry — the GRN_PROC_TOKENIZER plugin surface
# (grn_tokenizer_register, lib/tokenizers.c:779-828; plugin example
# plugins/tokenizers/mecab.c:1).  A plugin is a batch callable
# ``fn(texts: list[str]) -> list[(terms, positions)]`` registered under a
# name; every consumer (tokenize command, index build, query-side GET
# tokenize) resolves names through here, so a real TokenMecab drop-in
# would route end-to-end without touching the engine.  Build-side UDFs
# resolve the callable DRIVER-side (resolve_tokenizer) so it ships inside
# the closure — executor processes never see driver registry state.
# ---------------------------------------------------------------------------

_PLUGIN_TOKENIZERS: dict[str, object] = {}


def register_tokenizer(name: str, fn, overwrite: bool = False) -> None:
    """Register a plugin tokenizer under ``name``.  Builtin names are
    protected; re-registration requires ``overwrite=True``."""
    if name in ALL_TOKENIZERS:
        raise ValueError(f"cannot shadow builtin tokenizer {name!r}")
    if name in _PLUGIN_TOKENIZERS and not overwrite:
        raise ValueError(f"tokenizer {name!r} already registered")
    if not callable(fn):
        raise TypeError("plugin tokenizer must be callable")
    _PLUGIN_TOKENIZERS[name] = fn


def unregister_tokenizer(name: str) -> None:
    _PLUGIN_TOKENIZERS.pop(name, None)


def resolve_tokenizer(mode):
    """Driver-side resolution for UDF closures: returns the plugin
    callable when ``mode`` names one (so it pickles into the closure),
    else the mode itself (builtin names stay strings)."""
    return _PLUGIN_TOKENIZERS.get(mode, mode)

# TokenRegexp sentinels (tokenizers.c:489-730): a begin mark before the
# first content token and an end mark after the last, so \A / \z anchors
# become ordinary phrase tokens over the regexp index.  The values are the
# reference's own marks (grn_tokenizer BEGIN/END_MARK_UTF8, U+FFEF/U+FFF0)
# so tokenize-command output and lexicon dumps agree byte-for-byte.
REGEXP_BEGIN = "￯"
REGEXP_END = "￰"


def tokenize_batch(texts: Iterable[str], mode: str = "bigram") -> list[tuple[list[str], list[int]]]:
    """Tokenize a batch. Returns per-text ``(terms, positions)``.
    ``mode`` may also be a plugin name (registry above) or a resolved
    plugin callable (the closure-captured form UDFs ship)."""
    if callable(mode):
        return mode(list(texts))
    if mode in _PLUGIN_TOKENIZERS:
        return _PLUGIN_TOKENIZERS[mode](list(texts))
    if mode == "delimit":
        return [_delimit(t) for t in texts]
    if mode == "delimit_null":  # TokenDelimitNull (tokenizers.c:236)
        return [_delimit(t, "\x00") for t in texts]
    if mode == "delimit_null_norm":
        # whole-value tokens through NormalizerAuto — the shape of an
        # untokenized lexicon WITH a normalizer (PAT keys store the
        # normalized value; table_create/normalizer/auto/utf8)
        from .normalize import normalize

        return [_delimit(normalize(t or ""), "\x00") for t in texts]
    if mode == "regexp":
        # TokenRegexp = char bigrams over EVERY class (uni_* all off) plus
        # begin/end sentinel tokens — the lexicon shape grn_ii_select_regexp
        # (ii.c:6049-6117) phrase-matches extracted literals against
        base = tokenize_batch(texts, "bigram_split_symbol_alpha_digit")
        out = []
        for terms, poss in base:
            t = [REGEXP_BEGIN, *terms, REGEXP_END]
            p = [0, *[x + 1 for x in poss], (poss[-1] + 2) if poss else 1]
            out.append((t, p))
        return out
    if mode.endswith("_raw"):
        n = _NGRAM_VARIANTS[mode][0]
        return [
            (
                [(t or "")[i : i + n] for i in range(len(t or ""))],
                list(range(len(t or ""))),
            )
            for t in texts
        ]
    if mode != "code" and mode not in _NGRAM_VARIANTS:
        raise ValueError(f"unknown tokenizer {mode!r}")
    out: list[tuple[list[str], list[int]]] = []
    ascii_idx: list[int] = []
    ascii_texts: list[bytes] = []
    items = list(texts)
    for i, t in enumerate(items):
        t = t or ""
        if t.isascii():
            ascii_idx.append(i)
            ascii_texts.append(t.encode("ascii"))
            out.append(([], []))  # placeholder
        else:
            out.append(_tokenize_unicode(t, mode))
    if ascii_texts:
        fast = _tokenize_ascii_batch(ascii_texts, mode)
        for i, res in zip(ascii_idx, fast):
            out[i] = res
    return out


def tokenize(text: str, mode: str = "bigram") -> list[tuple[str, int]]:
    """Single-text convenience (the ``tokenize`` command, lib/proc.c:6897)."""
    terms, poss = tokenize_batch([text], mode)[0]
    return list(zip(terms, poss))


def _delimit(text: str, sep: str | None = None) -> tuple[list[str], list[int]]:
    terms = text.split(sep) if sep else text.split()
    terms = [t for t in terms if t]
    return terms, list(range(len(terms)))


# ---------------------------------------------------------------------------
# ASCII fast path: one numpy pass over a concatenated batch buffer.
# ---------------------------------------------------------------------------


def _doc_lens_after_mask(keep: np.ndarray, doc_starts: np.ndarray, doc_ends: np.ndarray) -> np.ndarray:
    """Per-doc surviving char count after masking (vectorized prefix-sum)."""
    csum = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
    return csum[doc_ends] - csum[doc_starts]


def _tokenize_ascii_batch(texts: list[bytes], mode: str) -> list[tuple[list[str], list[int]]]:
    n_docs = len(texts)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n_docs)
    buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
    if buf.size == 0:
        return [([], []) for _ in texts]
    doc_ends = np.cumsum(lens)
    doc_starts = doc_ends - lens

    cls = CLS_LUT[buf]

    if mode != "code":
        ngram_n, split_names, ignore_blank = _NGRAM_VARIANTS[mode]
        if ignore_blank:
            # TokenBigramIgnoreBlank*: blanks neither emit nor break runs
            # (the BLANK flag is ignored, tokenizers.c:318-345) — drop blank
            # chars from the buffer so adjacent same-class runs fuse
            keep = cls != BLANK
            buf = buf[keep]
            if buf.size == 0:
                return [([], []) for _ in texts]
            lens = _doc_lens_after_mask(keep, doc_starts, doc_ends)
            doc_ends = np.cumsum(lens)
            doc_starts = doc_ends - lens
            cls = CLS_LUT[buf]
    low = LOWER_LUT[buf]

    # boundaries: position i starts a new run
    bound = np.zeros(buf.size, dtype=bool)
    bound[0] = True
    bound[1:] |= cls[1:] != cls[:-1]
    bound[doc_starts[doc_starts < buf.size]] = True
    if mode == "code":
        # camel humps (computed on the RAW bytes, pre-lowercase):
        #   aB   -> boundary before B
        #   ABc  -> boundary before B (acronym followed by lowercase word)
        up = IS_UPPER[buf]
        lo = IS_LOWER[buf]
        hump = np.zeros(buf.size, dtype=bool)
        hump[1:] = lo[:-1] & up[1:]
        acr = np.zeros(buf.size, dtype=bool)
        acr[1:-1] = up[:-2] & up[1:-1] & lo[2:]
        bound |= hump | acr

    starts = np.nonzero(bound)[0]
    ends = np.append(starts[1:], buf.size)
    run_cls = cls[starts]
    keep = run_cls != BLANK
    starts, ends, run_cls = starts[keep], ends[keep], run_cls[keep]

    # doc id per run
    run_doc = np.searchsorted(doc_ends, starts, side="right")

    if mode == "code":
        return _emit_code(texts, low, buf, starts, ends, run_cls, run_doc, n_docs)
    split_mask = None
    if split_names:
        consts = {"alpha": ALPHA, "digit": DIGIT, "symbol": SYMBOL}
        split_mask = np.isin(run_cls, [consts[s] for s in split_names])
    return _emit_runs(texts, low, starts, ends, run_doc, n_docs, split_mask, ngram_n)


def _emit_runs(
    texts, low, starts, ends, run_doc, n_docs, split_mask=None, n=2
) -> list[tuple[list[str], list[int]]]:
    """Whole-run tokens (uni_* = 1); runs of a class in ``split_mask``
    instead emit overlapping n-grams with skip=1 and shortened tail
    (ngram_next, tokenizers.c:348-455 — e.g. SplitSymbolAlpha turns an
    alpha run 'abc' into ab, bc, c)."""
    low_bytes = low.tobytes()
    out: list[tuple[list[str], list[int]]] = [([], []) for _ in range(n_docs)]
    if split_mask is None:
        for s, e, d in zip(starts.tolist(), ends.tolist(), run_doc.tolist()):
            terms, poss = out[d]
            poss.append(len(terms))
            terms.append(low_bytes[s:e].decode("ascii"))
        return out
    for i, (s, e, d) in enumerate(zip(starts.tolist(), ends.tolist(), run_doc.tolist())):
        terms, poss = out[d]
        if split_mask[i]:
            for k in range(s, e):
                poss.append(len(terms))
                terms.append(low_bytes[k : min(k + n, e)].decode("ascii"))
        else:
            poss.append(len(terms))
            terms.append(low_bytes[s:e].decode("ascii"))
    return out


def _emit_code(
    texts, low, raw, starts, ends, run_cls, run_doc, n_docs
) -> list[tuple[list[str], list[int]]]:
    """Code tokenizer emission: identifier = maximal span of ALPHA/DIGIT/'_'
    runs; '_' runs inside identifiers are consumed; multi-segment identifiers
    also emit the full identifier (lowercased, '_' kept) at the first
    segment's position."""
    low_bytes = low.tobytes()
    n = starts.size
    # identifier-class runs: ALPHA, DIGIT, or a pure-underscore SYMBOL run
    und = np.zeros(n, dtype=bool)
    sym = run_cls == SYMBOL
    if sym.any():
        # a symbol run is "underscore" if its first char is '_' (runs are
        # same-class but may mix symbols; split out exact underscore runs)
        first_char = raw[starts]
        und = sym & (first_char == ord("_"))
        # mixed runs like "_+" — treat as underscore only if ALL chars are _
        for i in np.nonzero(und)[0].tolist():
            seg = raw[starts[i] : ends[i]]
            if not (seg == ord("_")).all():
                und[i] = False
    ident_cls = (run_cls == ALPHA) | (run_cls == DIGIT) | und

    out: list[tuple[list[str], list[int]]] = [([], []) for _ in range(n_docs)]
    i = 0
    while i < n:
        d = run_doc[i]
        terms, poss = out[d]
        if not ident_cls[i] or und[i]:
            # bare symbol run (or leading underscores outside identifier):
            # emit as one token, one position
            if not und[i]:
                poss.append(_next_pos(poss))
                terms.append(low_bytes[starts[i] : ends[i]].decode("ascii"))
            else:
                # leading '_' run: attach to following identifier if adjacent
                if (
                    i + 1 < n
                    and run_doc[i + 1] == d
                    and ident_cls[i + 1]
                    and not und[i + 1]
                    and starts[i + 1] == ends[i]
                ):
                    pass  # consumed as part of the identifier below
                else:
                    poss.append(_next_pos(poss))
                    terms.append(low_bytes[starts[i] : ends[i]].decode("ascii"))
            i += 1
            continue
        # identifier: greedily take runs while same doc, contiguous, ident class
        j = i
        seg_spans: list[tuple[int, int]] = []
        span_start = starts[i]
        while (
            j < n
            and run_doc[j] == d
            and ident_cls[j]
            and (j == i or starts[j] == ends[j - 1])
        ):
            if not und[j]:
                seg_spans.append((starts[j], ends[j]))
            j += 1
        span_end = ends[j - 1]
        # trailing underscores belong to the identifier text
        first_pos = _next_pos(poss)
        for k, (s, e) in enumerate(seg_spans):
            poss.append(first_pos + k)
            terms.append(low_bytes[s:e].decode("ascii"))
        if len(seg_spans) > 1:
            terms.append(low_bytes[span_start:span_end].decode("ascii"))
            poss.append(first_pos)
        i = j
    return out


def _next_pos(poss: list[int]) -> int:
    return (max(poss) + 1) if poss else 0


# ---------------------------------------------------------------------------
# Unicode fallback (per-string; NFKC + lower, CJK-ish letters → bigrams)
# ---------------------------------------------------------------------------


def _tokenize_unicode(text: str, mode: str) -> tuple[list[str], list[int]]:
    norm = unicodedata.normalize("NFKC", text).lower()
    gram_n, split_names, ignore_blank = _NGRAM_VARIANTS.get(mode, (2, (), False))
    if ignore_blank:
        norm = "".join(c for c in norm if char_class(c) != BLANK)
    split_consts = {
        {"alpha": ALPHA, "digit": DIGIT, "symbol": SYMBOL}[s] for s in split_names
    }
    classes = [char_class(c) for c in norm]
    terms: list[str] = []
    poss: list[int] = []
    i, n = 0, len(norm)
    while i < n:
        c = classes[i]
        if c == BLANK:
            i += 1
            continue
        j = i
        while j < n and classes[j] == c:
            j += 1
        run = norm[i:j]
        if c == NONASCII or c in split_consts:
            # overlapping n-grams with skip=1 + shortened tail
            # (tokenizers.c:312-313,430-447 ADD-mode behavior)
            # one token per char position, size min(n, remaining) — the
            # cursor advances one char per emitted gram down to the 1-char
            # tail, exactly like the ASCII split path
            for k in range(len(run)):
                poss.append(_next_pos(poss))
                terms.append(run[k : k + gram_n])
        else:
            poss.append(_next_pos(poss))
            terms.append(run)
        i = j
    return terms, poss
