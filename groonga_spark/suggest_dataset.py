"""Suggest dataset mirror — the reference's log-learned suggestion engine
(``plugins/suggest/suggest.c``, dataset schema from
``src/suggest/groonga_suggest_create_dataset.c:150-210``).

This module serves the conformance runner: the reference's suggest suite
(``test/command/suite/suggest/**``) drives a *stateful* learner
(``suggest_preparer`` in ``load --each``) over tiny event logs and then
queries it with the ``suggest`` command.  The learner's semantics are a
per-event sequential fold with early-exit rules (``learner_learn``,
``suggest.c:947-977``) — a driver-side mirror is the faithful shape for
fixture-sized data.  The scalable counterpart lives in
:mod:`groonga_spark.suggest`: completion / correction / co-occurrence as
DataFrame plans, where the pair table this learner maintains row-by-row
is built as one ``groupBy`` over the event log.

Implemented here, each citing its reference source:

* dataset tables (items / pairs / sequences / events / configuration) —
  ``groonga_suggest_create_dataset.c:155-210``;
* ``suggest_preparer`` learning — ``suggest.c:860-977``
  (``learner_learn_for_complete_and_correcnt``, ``…_for_suggest``,
  ``MIN_LEARN_DISTANCE`` 60 s, configuration-table weight);
* ``suggest --types complete|correct|suggest`` — ``suggest.c:298-526``
  (kana prefix-RK search, co-occurrence scoring with frequency /
  conditional-probability thresholds, similar-search correction with the
  ``1 + (freq2 >> 4) + boost`` re-score and edit-distance subtraction);
* romaji/hiragana → katakana RK conversion for the kana cursor
  (``GRN_CURSOR_RK``; the reference drives a generated state machine,
  ``lib/pat.c:2500-2900`` — this mirror uses the standard Hepburn/kunrei
  syllabary table, which is the same public mapping that machine
  encodes).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .normalize import normalize

MIN_LEARN_DISTANCE = 60 * 1_000_000  # µs (suggest.c:38)

# ---------------------------------------------------------------------------
# romaji → katakana (standard Hepburn + kunrei syllabary)
# ---------------------------------------------------------------------------

_ROMAJI: dict[str, str] = {
    "a": "ア", "i": "イ", "u": "ウ", "e": "エ", "o": "オ",
    "ka": "カ", "ki": "キ", "ku": "ク", "ke": "ケ", "ko": "コ",
    "ga": "ガ", "gi": "ギ", "gu": "グ", "ge": "ゲ", "go": "ゴ",
    "sa": "サ", "si": "シ", "shi": "シ", "su": "ス", "se": "セ", "so": "ソ",
    "za": "ザ", "zi": "ジ", "ji": "ジ", "zu": "ズ", "ze": "ゼ", "zo": "ゾ",
    "ta": "タ", "ti": "チ", "chi": "チ", "tu": "ツ", "tsu": "ツ",
    "te": "テ", "to": "ト",
    "da": "ダ", "di": "ヂ", "du": "ヅ", "de": "デ", "do": "ド",
    "na": "ナ", "ni": "ニ", "nu": "ヌ", "ne": "ネ", "no": "ノ",
    "ha": "ハ", "hi": "ヒ", "hu": "フ", "fu": "フ", "he": "ヘ", "ho": "ホ",
    "ba": "バ", "bi": "ビ", "bu": "ブ", "be": "ベ", "bo": "ボ",
    "pa": "パ", "pi": "ピ", "pu": "プ", "pe": "ペ", "po": "ポ",
    "ma": "マ", "mi": "ミ", "mu": "ム", "me": "メ", "mo": "モ",
    "ya": "ヤ", "yu": "ユ", "yo": "ヨ",
    "ra": "ラ", "ri": "リ", "ru": "ル", "re": "レ", "ro": "ロ",
    "wa": "ワ", "wo": "ヲ",
    "kya": "キャ", "kyu": "キュ", "kyo": "キョ",
    "gya": "ギャ", "gyu": "ギュ", "gyo": "ギョ",
    "sha": "シャ", "shu": "シュ", "sho": "ショ",
    "sya": "シャ", "syu": "シュ", "syo": "ショ",
    "ja": "ジャ", "ju": "ジュ", "jo": "ジョ",
    "jya": "ジャ", "jyu": "ジュ", "jyo": "ジョ",
    "zya": "ジャ", "zyu": "ジュ", "zyo": "ジョ",
    "cha": "チャ", "chu": "チュ", "cho": "チョ",
    "tya": "チャ", "tyu": "チュ", "tyo": "チョ",
    "nya": "ニャ", "nyu": "ニュ", "nyo": "ニョ",
    "hya": "ヒャ", "hyu": "ヒュ", "hyo": "ヒョ",
    "bya": "ビャ", "byu": "ビュ", "byo": "ビョ",
    "pya": "ピャ", "pyu": "ピュ", "pyo": "ピョ",
    "mya": "ミャ", "myu": "ミュ", "myo": "ミョ",
    "rya": "リャ", "ryu": "リュ", "ryo": "リョ",
    "fa": "ファ", "fi": "フィ", "fe": "フェ", "fo": "フォ",
    "va": "ヴァ", "vi": "ヴィ", "vu": "ヴ", "ve": "ヴェ", "vo": "ヴォ",
    "la": "ァ", "li": "ィ", "lu": "ゥ", "le": "ェ", "lo": "ォ",
    "xa": "ァ", "xi": "ィ", "xu": "ゥ", "xe": "ェ", "xo": "ォ",
    "-": "ー",
}

_CONSONANTS = set("bcdfghjklmpqrstvwxyz")


def _hira_to_kata(ch: str) -> str:
    o = ord(ch)
    if 0x3041 <= o <= 0x3096:
        return chr(o + 0x60)
    return ch


def rk_convert(q: str) -> tuple[str, str]:
    """(converted katakana prefix, trailing partial romaji).

    Mirrors ``rk_conv`` (lib/pat.c:2791-2820): hiragana maps to katakana,
    romaji consumes greedily through the syllabary (longest match),
    ``nn``/final ``n`` emit ン, doubled consonants emit ッ; characters
    with no transition pass through literally."""
    out: list[str] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if 0x3041 <= ord(c) <= 0x3096:
            out.append(_hira_to_kata(c))
            i += 1
            continue
        if not (c.isascii() and (c.isalpha() or c == "-")):
            out.append(c)
            i += 1
            continue
        # romaji run: longest syllable match
        if c == "n":
            nxt = q[i + 1] if i + 1 < n else ""
            if nxt == "n":
                out.append("ン")
                i += 2
                continue
            if not nxt or (
                nxt.isascii() and nxt.isalpha()
                and nxt in _CONSONANTS and nxt != "y"
            ):
                out.append("ン")
                i += 1
                continue
        if (
            c in _CONSONANTS
            and i + 1 < n
            and q[i + 1] == c
            and c not in ("n",)
        ):
            out.append("ッ")
            i += 1
            continue
        for ln in (3, 2, 1):
            if q[i : i + ln] in _ROMAJI:
                out.append(_ROMAJI[q[i : i + ln]])
                i += ln
                break
        else:
            # unfinished syllable: if some table entry continues it, the
            # rest of the query is a partial romaji state
            rest = q[i:]
            if any(r.startswith(rest) for r in _ROMAJI):
                return "".join(out), rest
            out.append(c)
            i += 1
    return "".join(out), ""


def rk_prefix_match(query: str, key: str) -> bool:
    """Does ``key`` prefix-match ``query`` under RK conversion
    (GRN_CURSOR_PREFIX|GRN_CURSOR_RK)?  A trailing partial romaji state
    matches any kana reachable from it (the reference expands the rk
    tree sub-states, lib/pat.c:2823-2900)."""
    conv, partial = rk_convert(query)
    if not key.startswith(conv):
        return False
    if not partial:
        return True
    rest = key[len(conv) :]
    if not rest:
        return False
    for r, kana in _ROMAJI.items():
        if r.startswith(partial) and (
            rest.startswith(kana) or kana.startswith(rest)
        ):
            return True
    return False


# ---------------------------------------------------------------------------
# dataset state
# ---------------------------------------------------------------------------


@dataclass
class _Item:
    id: int
    key: str
    kana: list[str] = field(default_factory=list)
    boost: int = 0
    freq: int = 0
    freq2: int = 0
    last: int = 0  # µs
    # whether the key insertion went through the record-add path that
    # maintains the bigram _key index: keys registered by the suggest
    # learner's ADD-mode token cursor (suggest.c:905-909) skip the index
    # hook, so similar-search postings never see them; a later re-add of
    # the same key is a lookup, not an insert, and never back-fills
    indexed: bool = True


@dataclass
class _Pair:
    id: int
    pre: int
    post: int
    freq0: int = 0
    freq1: int = 0
    freq2: int = 0


@dataclass
class _Event:
    id: int
    type_id: int
    item_id: int
    time: int  # µs


class SuggestDataset:
    """One ``#@suggest-create-dataset <name>`` instance."""

    def __init__(self, name: str):
        self.name = name
        self.items: dict[str, _Item] = {}
        self._items_by_id: dict[int, _Item] = {}
        self.pairs: dict[int, _Pair] = {}  # (post_id << 32) + pre_id
        self.pair_list: list[_Pair] = []
        self.seqs: dict[str, list[int]] = {}
        self.events: dict[int, _Event] = {}
        self.event_types: dict[str, int] = {}
        self.weight = 1

    # -- tables ---------------------------------------------------------

    def _item(self, key: str, indexed: bool = True) -> _Item:
        k = normalize(key)
        it = self.items.get(k)
        if it is None:
            it = _Item(id=len(self.items) + 1, key=k, indexed=indexed)
            self.items[k] = it
            self._items_by_id[it.id] = it
        return it

    def load_items(self, rows: list[dict]) -> int:
        """``load --table item_<ds>`` (kana vector + boost)."""
        n = 0
        for r in rows:
            if not isinstance(r, dict) or not r.get("_key"):
                continue
            it = self._item(str(r["_key"]))
            if "kana" in r:
                v = r["kana"]
                vals = v if isinstance(v, list) else [v]
                it.kana = [normalize(str(x)) for x in vals if str(x)]
            if "boost" in r:
                it.boost = int(r["boost"] or 0)
            n += 1
        return n

    def load_configuration(self, rows: list[dict]) -> int:
        for r in rows:
            if isinstance(r, dict) and normalize(
                str(r.get("_key", ""))
            ) == normalize(self.name):
                self.weight = int(r.get("weight", 1) or 0)
        return len(rows)

    # -- learner (suggest.c:947-977) -------------------------------------

    def learn_events(self, rows: list[dict]) -> int:
        n = 0
        for r in rows:
            if isinstance(r, dict):
                self._learn_one(r)
                n += 1
        return n

    def _pair(self, post_id: int, pre_id: int) -> tuple[_Pair, bool]:
        key = (post_id << 32) + pre_id
        p = self.pairs.get(key)
        if p is not None:
            return p, False
        p = _Pair(id=len(self.pair_list) + 1, pre=pre_id, post=post_id)
        self.pairs[key] = p
        self.pair_list.append(p)
        return p, True

    def _learn_one(self, row: dict) -> None:
        item_key = str(row.get("item") or "")
        seq_key = str(row.get("sequence") or "")
        if not item_key or not seq_key:
            return  # learner_is_valid_input
        w = self.weight
        tname = row.get("type")
        type_id = 0
        if tname:
            type_id = self.event_types.setdefault(
                str(tname), len(self.event_types) + 1
            )
        time_us = int(float(row.get("time") or 0) * 1_000_000)
        post = self._item(item_key)
        ev = _Event(
            id=len(self.events) + 1,
            type_id=type_id,
            item_id=post.id,
            time=time_us,
        )
        self.events[ev.id] = ev
        seq = self.seqs.setdefault(seq_key, [])
        post.freq += w
        post.last = time_us
        if type_id:
            post.freq2 += w
            # complete/correct learning: walk the sequence's prior events
            # newest-first (learner_learn_for_complete_and_correcnt,
            # suggest.c:860-898)
            for ev_id in reversed(seq):
                pe = self.events[ev_id]
                if time_us - pe.time >= MIN_LEARN_DISTANCE:
                    break
                pair, _ = self._pair(post.id, pe.item_id)
                if pe.type_id:
                    pair.freq1 += w
                    break
                pair.freq0 += w
            # suggest learning: TokenDelimit tokens of the submitted key
            # register as items and pair with it (…_for_suggest,
            # suggest.c:900-940)
            seen: set[int] = set()
            for tok in post.key.split(" "):
                if not tok:
                    continue
                tid_item = self._item(tok, indexed=False)
                if tid_item.id == post.id:
                    break
                pair, _ = self._pair(post.id, tid_item.id)
                if tid_item.id not in seen:
                    seen.add(tid_item.id)
                    pair.freq2 += w
        seq.append(ev.id)

    # -- suggest command (suggest.c:298-526) ------------------------------

    def _cooccur(
        self,
        res: dict[int, float],
        tid: "int | None",
        freq_attr: str,
        ft: int,
        cpt: float,
    ) -> float:
        max_score = 0.0
        if not tid:
            return max_score
        for pair in self.pair_list:
            if pair.pre != tid:
                continue
            pfreq = getattr(pair, freq_attr)
            post = self._items_by_id[pair.post]
            cp = pfreq / post.freq2 if post.freq2 > 0 else 0.0
            if (
                pfreq >= ft
                and post.freq >= ft
                and cp >= cpt
                and post.boost >= 0
            ):
                if max_score < pfreq + post.boost:
                    max_score = pfreq + post.boost
                added = pair.post not in res
                res[pair.post] = res.get(pair.post, 0.0) + pfreq
                if added:
                    res[pair.post] += post.boost
        return max_score

    def _complete_add(self, res: dict[int, float], it: _Item, ft: int) -> None:
        if it.boost >= 0:
            score = 1 + it.freq + it.boost
            if score >= ft:
                res[it.id] = res.get(it.id, 0.0) + score

    def complete(
        self, q: str, ft: int, cpt: float, prefix_mode: str
    ) -> dict[int, float]:
        res: dict[int, float] = {}
        tid = self.items.get(q)
        if q:
            # kana RK+prefix cursor: kana keys in PAT (byte) order, each
            # key's items in id order (suggest.c:318-343)
            kana_keys = sorted(
                {k for it in self.items.values() for k in it.kana}
            )
            for kk in kana_keys:
                if rk_prefix_match(q, kk):
                    for it in sorted(
                        (i for i in self.items.values() if kk in i.kana),
                        key=lambda i: i.id,
                    ):
                        self._complete_add(res, it, ft)
            self._cooccur(res, tid.id if tid else None, "freq0", ft, cpt)
            if prefix_mode == "yes" or (prefix_mode == "auto" and not res):
                for it in sorted(
                    (i for i in self.items.values() if i.key.startswith(q)),
                    key=lambda i: i.key,
                ):
                    self._complete_add(res, it, ft)
        return res

    def _similar(self, res: dict[int, float], q: str) -> None:
        """grn_ii_similar_search over the bigram index on item _key
        (ii.c:5836-5960; max_size=2, similarity_threshold=0 per
        suggest.c:404-408)."""
        from .tokenize import tokenize

        item_tokens = {
            it.id: [t for t, _p in tokenize(it.key, "bigram")]
            for it in self.items.values()
            if it.indexed
        }
        lexicon: dict[str, set[int]] = {}
        for iid, toks in item_tokens.items():
            for t in toks:
                lexicon.setdefault(t, set()).add(iid)
        qtf: dict[str, int] = {}
        for t, _p in tokenize(q, "bigram"):
            if t in lexicon:
                qtf[t] = qtf.get(t, 0) + 1
        max_size = 2
        # grn_ii_estimate_size (ii.c:4470-4494): a single inline posting
        # estimates 1; a buffered term estimates df + size_in_buffer + 2
        # (an overestimate ≥ df + 2) — so the rarity bonus max_size/es
        # only fires for df == 1 terms
        weights = {
            t: w
            + max_size
            // (1 if len(lexicon[t]) == 1 else len(lexicon[t]) + 2)
            for t, w in qtf.items()
        }
        limit = (len(weights) >> 3) + 1
        chosen = sorted(weights, key=lambda t: -weights[t])[:limit]
        for t in chosen:
            w1 = weights[t]
            for iid in sorted(lexicon[t]):
                tf = item_tokens[iid].count(t)
                res[iid] = res.get(iid, 0.0) + w1 * tf

    def correct(
        self, q: str, ft: int, cpt: float, similar_mode: str
    ) -> dict[int, float]:
        res: dict[int, float] = {}
        tid = self.items.get(q)
        max_score = self._cooccur(
            res, tid.id if tid else None, "freq1", ft, cpt
        )
        if q and (
            similar_mode == "yes"
            or (similar_mode == "auto" and max_score < ft)
        ):
            self._similar(res, q)
            # re-score + threshold filter (suggest.c:414-441)
            for iid in list(res):
                it = self._items_by_id[iid]
                if it.boost >= 0:
                    score = 1 + (it.freq2 >> 4) + it.boost
                    res[iid] += score
                    if score >= ft:
                        continue
                del res[iid]
            # _score -= edit_distance(_key, query) (suggest.c:446-494)
            for iid in list(res):
                res[iid] -= _edit_distance(self._items_by_id[iid].key, q)
                if res[iid] < ft:
                    del res[iid]
        return res

    def suggest(self, q: str, ft: int, cpt: float) -> dict[int, float]:
        res: dict[int, float] = {}
        tid = self.items.get(q)
        self._cooccur(res, tid.id if tid else None, "freq2", ft, cpt)
        return res

    def run(
        self,
        types: str,
        query: str,
        frequency_threshold: int = 100,
        conditional_probability_threshold: float = 0.2,
        prefix_search: str = "auto",
        similar_search: str = "auto",
        limit: int = 10,
        offset: int = 0,
    ) -> dict:
        """The ``suggest`` command body: {type: result-table JSON}."""
        q = normalize(query or "")
        out: dict = {}
        for ty in ("complete", "correct", "suggest"):
            if ty not in types:
                continue
            if ty == "complete":
                res = self.complete(
                    q,
                    frequency_threshold,
                    conditional_probability_threshold,
                    prefix_search,
                )
            elif ty == "correct":
                res = self.correct(
                    q,
                    frequency_threshold,
                    conditional_probability_threshold,
                    similar_search,
                )
            else:
                res = self.suggest(
                    q,
                    frequency_threshold,
                    conditional_probability_threshold,
                )
            # ties keep result-table insertion order (grn_table_sort over
            # the res hash; dicts preserve first-add order)
            order = {iid: i for i, iid in enumerate(res)}
            ranked = sorted(
                res.items(), key=lambda kv: (-kv[1], order[kv[0]])
            )
            page = ranked[offset : offset + limit if limit >= 0 else None]
            out[ty] = [
                [len(res)],
                [["_key", "ShortText"], ["_score", "Int32"]],
                *[
                    [self._items_by_id[iid].key, int(score)]
                    for iid, score in page
                ],
            ]
        return out


def _edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
        prev = cur
    return prev[-1]
