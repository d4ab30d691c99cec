"""Reference-parity KWIC snippets and keyword highlighting (pure Python).

Re-expresses the reference's snippet/highlight pipeline:

- ``grn_snip_exec`` / ``grn_snip_get_result`` (lib/snip.c:585-756,759-840):
  byte-windowed multi-fragment KWIC with tag insertion and HTML escaping;
- ``GRN_BM_COMPARE`` offset mapping (lib/snip.c:85-120): keyword search runs
  over the NORMALIZED text, hit offsets map back to ORIGINAL bytes through
  the normalizer's checks array;
- ``grn_pat_scan`` (lib/pat.c:1553) + ``grn_pat_tag_keys``
  (lib/proc.c:5894-5960): longest-match keyword tagging for
  ``highlight_html`` / ``highlight_full`` (lib/proc.c:5960-6150);
- ``grn_text_escape_xml`` (lib/str.c): ``" < > &`` escapes.

These run driver-side in the conformance runner (strings are single rows
of a select page) and are Arrow-batchable via a pandas UDF for bulk use.
"""

from __future__ import annotations

import unicodedata

_NONSTOP, _STOP, _ACROSS = 0, 1, 2

DEFAULT_OPEN = '<span class="keyword">'
DEFAULT_CLOSE = "</span>"


def norm_map(text: str, remove_blank: bool = False) -> tuple[bytes, list[int]]:
    """NormalizerAuto (per-char NFKC + lowercase) normalized utf-8 bytes
    plus the grn_string WITH_CHECKS array: one entry per normalized byte —
    original bytes consumed at a char head (including preceding removed
    blanks), 0 on continuation bytes, -1 on 2nd+ chars of an expansion."""
    out = bytearray()
    checks: list[int] = []
    pending = 0
    for ch in text:
        b_in = len(ch.encode("utf-8"))
        if remove_blank and ch.isspace():
            pending += b_in
            continue
        norm = unicodedata.normalize("NFKC", ch).lower()
        if not norm:
            pending += b_in
            continue
        for j, oc in enumerate(norm):
            ob = oc.encode("utf-8")
            out += ob
            checks.append((b_in + pending) if j == 0 else -1)
            checks.extend([0] * (len(ob) - 1))
            if j == 0:
                pending = 0
    return bytes(out), checks


def _raw_map(text: str) -> tuple[bytes, list[int]]:
    """No-normalizer mapping: identity bytes, checks = utf-8 char lengths."""
    out = text.encode("utf-8")
    checks = []
    for ch in text:
        n = len(ch.encode("utf-8"))
        checks.append(n)
        checks.extend([0] * (n - 1))
    return out, checks


def _prefix(checks: list[int]) -> list[int]:
    pos = [0] * (len(checks) + 1)
    for i, c in enumerate(checks):
        pos[i + 1] = pos[i] + (c if c > 0 else 0)
    return pos


def _head(checks: list[int], i: int) -> int:
    while i > 0 and checks[i] <= 0:
        i -= 1
    return i


def _isspace_at(orig: bytes, off: int) -> int:
    """Byte length of a whitespace char at ``off`` in utf-8, else 0."""
    if off >= len(orig):
        return 0
    b0 = orig[off]
    n = 1 if b0 < 0x80 else 2 if b0 < 0xE0 else 3 if b0 < 0xF0 else 4
    try:
        return n if orig[off : off + n].decode("utf-8").isspace() else 0
    except UnicodeDecodeError:
        return 0


def occurrences(
    norm: bytes,
    checks: list[int],
    kw_norm: bytes,
    orig: bytes,
    skip_leading_spaces: bool,
) -> list[tuple[int, int]]:
    """Non-overlapping keyword hits → [(orig_start, orig_end)] in scan
    order, with the GRN_BM_COMPARE rules: a hit starting on a continuation
    byte is rejected; one starting mid-expansion snaps to the char head;
    SKIP_LEADING_SPACES advances the start past original whitespace."""
    if not kw_norm:
        return []
    pos = _prefix(checks)
    res = []
    f = norm.find(kw_norm)
    while f != -1:
        if checks[f] == 0:  # continuation byte: not a match start
            f = norm.find(kw_norm, f + 1)
            continue
        start = pos[f] if checks[f] > 0 else pos[_head(checks, f)]
        if skip_leading_spaces:
            while True:
                step = _isspace_at(orig, start)
                if not step:
                    break
                start += step
        end = pos[f + len(kw_norm)]
        res.append((start, end))
        f = norm.find(kw_norm, f + len(kw_norm))
    return res


def _firstbyte(orig: bytes, off: int, direction: int) -> int:
    """Snap ``off`` to a utf-8 char head (grn_snip_find_firstbyte)."""
    while 0 < off < len(orig) and (orig[off] & 0xC0) == 0x80:
        off += direction
    return off


def _escape(b: bytes) -> bytes:
    return (
        b.replace(b"&", b"&amp;")
        .replace(b"<", b"&lt;")
        .replace(b">", b"&gt;")
        .replace(b'"', b"&quot;")
    )


def snip_exec(
    text: str,
    keywords: "list[tuple[str, str, str]]",
    width: int = 200,
    max_results: int = 3,
    html_escape: bool = True,
    skip_leading_spaces: bool = True,
    normalize: bool = True,
) -> "list[str] | None":
    """Port of grn_snip_exec + get_result (lib/snip.c:585-840): byte-
    faithful fragment windows over the ORIGINAL text with per-keyword
    tags.  Returns None for empty text or when no keyword occurs
    (func_snippet_html returns VOID → JSON null, lib/proc.c:4905-4955)."""
    if not text or not keywords:
        return None
    orig = text.encode("utf-8")
    norm, checks = norm_map(text, remove_blank=True) if normalize else _raw_map(text)
    conds = []
    for kw, ot, ct in keywords:
        kn = (norm_map(kw, remove_blank=True)[0] if normalize
              else kw.encode("utf-8"))
        occs = occurrences(norm, checks, kn, orig, skip_leading_spaces)
        conds.append({
            "occs": occs, "i": 0, "count": 0, "open": ot.encode(),
            "close": ct.encode(),
            "stop": _NONSTOP if occs else _STOP,
        })

    def advance(c):
        c["i"] += 1
        if c["i"] >= len(c["occs"]):
            c["stop"] = _STOP

    results = []  # (start, end, [(cond, tag_start, tag_end)])
    last_end_offset = 0
    last_last_end_offset = 0
    unfound = len(conds)
    while True:
        tags: list[tuple[dict, int, int]] = []
        last_tag_end = 0
        found_cond = False
        snip_start = 0
        while True:
            cond = None
            min_s, max_e = None, -1
            for c in conds:
                if c["stop"] != _NONSTOP:
                    continue
                s, e = c["occs"][c["i"]]
                if min_s is None or s < min_s or (s == min_s and e > max_e):
                    min_s, max_e, cond = s, e, c
            if cond is None:
                break
            s, e = cond["occs"][cond["i"]]
            if not tags:
                # prioritize keywords not yet shown when fragments are
                # scarce (snip.c:646-664)
                if (max_results - len(results)) <= unfound and cond["count"] > 0:
                    exclude = True
                    for other in conds:
                        if other is cond:
                            continue
                        oi = min(other["i"], len(other["occs"]) - 1)
                        if (
                            other["occs"]
                            and other["stop"] == _NONSTOP
                            and other["occs"][oi][1] <= s + width
                            and other["count"] == 0
                        ):
                            exclude = False
                    if exclude:
                        advance(cond)
                        continue
                snip_start = s
            else:
                if s >= snip_start + width:
                    break
                if s < last_tag_end:  # would nest invalid HTML
                    advance(cond)
                    continue
            if e > snip_start + width:
                cond["stop"] = _ACROSS  # keyword across the window edge
                advance(cond)
                if cond["stop"] == _ACROSS and cond["i"] >= len(cond["occs"]):
                    cond["stop"] = _STOP
            else:
                found_cond = True
                if cond["count"] == 0:
                    unfound -= 1
                cond["count"] += 1
                last_end_offset = e
                tags.append((cond, s, e))
                last_tag_end = e
                advance(cond)
        if not found_cond:
            break
        if snip_start + last_end_offset < width:
            snip_start = 0
        else:
            snip_start = max(
                min((snip_start + last_end_offset - width) // 2,
                    len(orig) - width),
                last_last_end_offset,
            )
        snip_start = _firstbyte(orig, snip_start, 1)
        snip_end = snip_start + width
        if snip_end < len(orig):
            snip_end = _firstbyte(orig, snip_end, -1)
        else:
            snip_end = len(orig)
        last_last_end_offset = snip_end
        results.append((snip_start, snip_end, tags))
        if len(results) == max_results:
            break
        all_stop = True
        for c in conds:
            if c["stop"] != _STOP:
                all_stop = False
                c["stop"] = _NONSTOP
        if all_stop:
            break
    if not results:
        return None
    out = []
    for s, e, tags in results:
        buf = bytearray()
        opens = {}
        closes = {}
        for c, ts, te in tags:
            if te > e:
                continue
            opens.setdefault(ts, []).append(c["open"])
            closes.setdefault(te, []).append(c["close"])
        i = s
        while i < e:
            for t in opens.get(i, ()):
                buf += t
            nb = orig[i]
            step = 1 if nb < 0x80 else 2 if nb < 0xE0 else 3 if nb < 0xF0 else 4
            piece = orig[i : i + step]
            buf += _escape(piece) if html_escape else piece
            i += step
            for t in reversed(closes.get(i, ())):
                buf += t
        out.append(buf.decode("utf-8", "replace"))
    return out


def snippet_html(text: str, keywords: "list[str]") -> "list[str] | None":
    """``snippet_html(column)`` defaults (lib/proc.c:4905-4955): width 200
    bytes, 3 fragments, default span tags, HTML escape, NormalizerAuto,
    SKIP_LEADING_SPACES; keywords come from the select condition."""
    return snip_exec(
        text, [(k, DEFAULT_OPEN, DEFAULT_CLOSE) for k in keywords]
    )


def tag_keys(
    text: str,
    keyword_sets: "list[tuple[str, str, str]]",
    use_escape: bool = True,
    normalize: bool = True,
) -> str:
    """grn_pat_scan + grn_pat_tag_keys (lib/pat.c:1553, lib/proc.c:5906):
    longest-match keyword tagging over the whole text, escaping outside
    AND inside tags; hit offsets map through the normalizer's checks."""
    orig = text.encode("utf-8")
    norm, checks = norm_map(text) if normalize else _raw_map(text)
    pos = _prefix(checks)
    kws = []  # (kw_norm_bytes, open, close) — first add wins duplicates
    seen = set()
    for kw, ot, ct in keyword_sets:
        kn = norm_map(kw)[0] if normalize else kw.encode("utf-8")
        if kn and kn not in seen:
            seen.add(kn)
            kws.append((kn, ot.encode(), ct.encode()))
    out = bytearray()

    def put(b: bytes):
        out.extend(_escape(b) if use_escape else b)

    i = 0
    prev = 0
    offset0 = 0  # original offset of the last char head (grn_pat_scan)
    while i < len(norm):
        best = None
        for kn, ot, ct in kws:  # longest match (pat LCP search)
            if norm.startswith(kn, i) and (
                best is None or len(kn) > len(best[0])
            ):
                best = (kn, ot, ct)
        if best is not None:
            kn, ot, ct = best
            start = pos[i] if checks[i] > 0 else offset0
            end = pos[i + len(kn)]
            put(orig[prev:start])
            out += ot
            put(orig[start:end])
            out += ct
            prev = end
            if checks[i] > 0:
                offset0 = pos[i]
            i += len(kn)
        else:
            if checks[i] > 0:
                offset0 = pos[i]
            i += 1
            while i < len(norm) and checks[i] == 0:
                i += 1
    put(orig[prev:])
    return out.decode("utf-8", "replace")


def highlight_html(text: str, keywords: "list[str]") -> str:
    """``highlight_html(column)`` (lib/proc.c:5960-6045): every condition
    keyword wrapped in the default span tag, NormalizerAuto matching."""
    return tag_keys(
        text, [(k, DEFAULT_OPEN, DEFAULT_CLOSE) for k in keywords]
    )


def highlight_full(text: str, normalizer_name, use_escape, *sets):
    """``highlight_full(column, normalizer, escape, kw1, open1, close1,
    …)`` (lib/proc.c:6045-6150); wrong arity or a non-normalizer arg →
    None (the reference errors per-call and emits null)."""
    if len(sets) == 0 or len(sets) % 3 != 0:
        return None
    if not isinstance(normalizer_name, str) or not isinstance(use_escape, bool):
        return None
    if normalizer_name not in ("", "NormalizerAuto"):
        return None
    keyword_sets = [
        (sets[i], sets[i + 1], sets[i + 2]) for i in range(0, len(sets), 3)
    ]
    return tag_keys(
        text, keyword_sets, use_escape=use_escape,
        normalize=bool(normalizer_name),
    )
