"""Porter stemmer — the ``TokenFilterStem`` analogue.

The reference wraps libstemmer (plugins/token_filters/stem.c:27-44); this is
a from-scratch implementation of the published Porter (1980) algorithm — the
English default of libstemmer — so the filter works without native deps.
Applied at BOTH index (ADD) and query (GET) time, like the reference filter.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in [C](VC)^m[V]."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    if not (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2) and _is_cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


def _replace(w: str, suf: str, rep: str, min_m: int) -> str | None:
    if w.endswith(suf):
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > min_m:
            return stem + rep
    return None


def stem(word: str) -> str:
    """Porter-stem one lowercase word."""
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ):
        r = _replace(w, suf, rep, 0)
        if r is not None:
            w = r
            break

    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        r = _replace(w, suf, rep, 0)
        if r is not None:
            w = r
            break

    # step 4
    for suf in (
        "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
        "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic", "ou",
    ):
        if w.endswith(suf):
            stem_ = w[: len(w) - len(suf)]
            # the "ion" rule additionally requires the stem to end s/t (*S|*T)
            if suf == "ion" and not (stem_ and stem_[-1] in "st"):
                break
            if _measure(stem_) > 1:
                w = stem_
            break

    # step 5a
    if w.endswith("e"):
        stem_ = w[:-1]
        m = _measure(stem_)
        if m > 1 or (m == 1 and not _cvc(stem_)):
            w = stem_

    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def _is_stemmable(t: str) -> bool:
    """The reference filter only stems tokens of ASCII alphanumerics plus
    ``'`` and ``-`` (stem.c:70-115 is_stemmable)."""
    return bool(t) and all(
        c.isascii() and (c.isalnum() or c in "'-") for c in t
    )


def stem_token(t: str) -> str:
    """Stem one token with the reference filter's semantics
    (stem.c:172-233 stem_filter): non-stemmable tokens pass through; an
    ALL-UPPERCASE token is lowercased, stemmed, and re-uppercased
    (stem.c normalize/unnormalize); libstemmer's English (Porter2)
    apostrophe prelude strips a trailing ``'s'``/``'s``/``'``."""
    if not _is_stemmable(t):
        return t
    has_upper = any(c.isupper() for c in t)
    all_upper = has_upper and not any(c.islower() for c in t)
    w = t.lower() if all_upper else t
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: len(w) - len(suf)]
            break
    w = stem(w)
    return w.upper() if all_upper else w


def stem_terms(terms: list[str]) -> list[str]:
    """Stem a token list; non-stemmable tokens pass through unchanged."""
    return [stem_token(t) for t in terms]
