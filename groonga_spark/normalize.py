"""NormalizerAuto semantics, vectorized for ASCII.

Re-implements the behavior of Groonga's ``NormalizerAuto`` ASCII path
(reference ``lib/normalizer.c:759-857`` ``ascii_normalize``): lowercase
A-Z, strip unprintables (< 0x20, 0x7f) and spaces (setting a BLANK break),
and tag every character with a class — DIGIT (0-9), ALPHA (a-zA-Z), SYMBOL
(everything else printable; note ``_``, ``@`` and backtick are SYMBOL,
normalizer.c:823-836).  Non-ASCII text goes through the NFKC+lower fallback
(Groonga uses generated NFKC tables, ``lib/nfkc.c``).

Character classes returned by :data:`CLS_LUT`:
  0 = BLANK (stripped; breaks token runs)
  1 = DIGIT
  2 = ALPHA
  3 = SYMBOL
  4 = non-ASCII (triggers the unicode fallback path)
"""

from __future__ import annotations

import unicodedata

import numpy as np

BLANK, DIGIT, ALPHA, SYMBOL, NONASCII = 0, 1, 2, 3, 4

CLS_LUT = np.full(256, SYMBOL, dtype=np.uint8)
CLS_LUT[:0x21] = BLANK  # control chars + space
CLS_LUT[0x7F] = BLANK
for _c in range(ord("0"), ord("9") + 1):
    CLS_LUT[_c] = DIGIT
for _c in range(ord("a"), ord("z") + 1):
    CLS_LUT[_c] = ALPHA
for _c in range(ord("A"), ord("Z") + 1):
    CLS_LUT[_c] = ALPHA
CLS_LUT[0x80:] = NONASCII

LOWER_LUT = np.arange(256, dtype=np.uint8)
LOWER_LUT[ord("A") : ord("Z") + 1] = np.arange(ord("a"), ord("z") + 1, dtype=np.uint8)

IS_UPPER = np.zeros(256, dtype=bool)
IS_UPPER[ord("A") : ord("Z") + 1] = True
IS_LOWER = np.zeros(256, dtype=bool)
IS_LOWER[ord("a") : ord("z") + 1] = True


def char_class(ch: str) -> int:
    """Class of a single (possibly non-ASCII) character after NFKC."""
    o = ord(ch)
    if o < 0x80:
        return int(CLS_LUT[o])
    if ch.isspace():
        return BLANK
    cat = unicodedata.category(ch)
    if cat.startswith("N"):
        return DIGIT
    if cat.startswith("L"):
        return NONASCII  # non-ASCII letter → n-gram class
    return SYMBOL


def normalize(text: str) -> str:
    """The ``normalize`` command surface (lib/proc.c:6889): NFKC + lower +
    blank stripping collapsed to single spaces between token runs."""
    if text.isascii():
        b = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
        low = LOWER_LUT[b]
        keep = CLS_LUT[b] != BLANK
        # collapse: emit a space where a blank gap separated two kept chars
        out = []
        prev_blank = False
        for ch, k in zip(low.tolist(), keep.tolist()):
            if k:
                if prev_blank and out:
                    out.append(0x20)
                out.append(ch)
                prev_blank = False
            else:
                prev_blank = True
        return bytes(out).decode("ascii")
    norm = unicodedata.normalize("NFKC", text).lower()
    out_s: list[str] = []
    prev_blank = False
    for ch in norm:
        if char_class(ch) == BLANK:
            prev_blank = True
            continue
        if prev_blank and out_s:
            out_s.append(" ")
        out_s.append(ch)
        prev_blank = False
    return "".join(out_s)
