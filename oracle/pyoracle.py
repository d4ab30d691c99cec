"""Pure-Python single-process oracle for rank-identity testing.

Mirrors the reference's golden `.test`/`.expected` convention (SURVEY §5):
exhaustive, no index, no Spark — tokenize every doc, score every candidate
with the pinned BM25 (groonga_spark.scoring), break ties by doc_id asc.
Shares the tokenizer implementation with the engine by construction; the
*scoring, set algebra, phrase/NEAR verification and top-k* paths are fully
independent re-implementations, which is what the rank-identity tests
exercise.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass

from groonga_spark import scoring
from groonga_spark.query import parser as qp
from groonga_spark.tokenize import tokenize_batch


@dataclass
class OracleIndex:
    # (sid -> doc_id -> [(term, pos)...])
    docs: dict[int, dict[int, list[tuple[str, int]]]]
    n_docs: int
    sections: dict[int, str]
    tokenizer: str

    @classmethod
    def build(cls, rows: list[dict], text_cols: list[str], tokenizer: str = "bigram", id_col: str = "doc_id"):
        docs: dict[int, dict[int, list[tuple[str, int]]]] = {}
        for i, col in enumerate(text_cols):
            sid = i + 1
            texts = [r[col] or "" for r in rows]
            toks = tokenize_batch(texts, tokenizer)
            docs[sid] = {
                int(r[id_col]): list(zip(t[0], t[1])) for r, t in zip(rows, toks)
            }
        return cls(
            docs=docs,
            n_docs=len(rows),
            sections={i + 1: c for i, c in enumerate(text_cols)},
            tokenizer=tokenizer,
        )

    # --- stats -----------------------------------------------------------
    def dl(self, sid: int, doc: int) -> int:
        # doc length counts emitted tokens EXCLUDING duplicate-position
        # extras? No: dl = total emitted tokens (matches engine, which sums
        # tf over all tokens including full-identifier extras).
        return len(self.docs[sid][doc])

    def avgdl(self, sid: int) -> float:
        total = sum(len(v) for v in self.docs[sid].values())
        return float(total) / float(self.n_docs)

    def df(self, term: str) -> int:
        hit = set()
        for sid, dd in self.docs.items():
            for doc, toks in dd.items():
                if any(t == term for t, _ in toks):
                    hit.add(doc)
        return len(hit)

    def tf(self, sid: int, doc: int, term: str) -> int:
        return sum(1 for t, _ in self.docs[sid][doc] if t == term)

    def positions(self, sid: int, doc: int, term: str) -> list[int]:
        return [p for t, p in self.docs[sid][doc] if t == term]

    def terms(self) -> set[str]:
        out = set()
        for dd in self.docs.values():
            for toks in dd.values():
                out.update(t for t, _ in toks)
        return out


class OracleEngine:
    def __init__(self, idx: OracleIndex):
        self.idx = idx
        self._avgdl = {sid: idx.avgdl(sid) for sid in idx.docs}
        self._df_cache: dict[str, int] = {}

    def _df(self, term: str) -> int:
        if term not in self._df_cache:
            self._df_cache[term] = self.idx.df(term)
        return self._df_cache[term]

    def _get_tokens(self, text: str) -> tuple[list[str], list[int]]:
        terms, poss = tokenize_batch([text], self.idx.tokenizer)[0]
        if self.idx.tokenizer == "code":
            by_pos: dict[int, list[str]] = {}
            for t, p in zip(terms, poss):
                by_pos.setdefault(p, []).append(t)
            seg_pos = sorted(by_pos)
            seg_terms = [by_pos[p][0] for p in seg_pos]
            fulls = [v[1] for v in by_pos.values() if len(v) > 1]
            if len(fulls) == 1 and fulls[0].replace("_", "") == "".join(seg_terms):
                return [fulls[0]], [0]
            return seg_terms, seg_pos
        return terms, poss

    def _term_scores(self, term: str, weights: dict[int, float]) -> dict[int, float]:
        df = self._df(term)
        if df == 0:
            return {}
        out: dict[int, float] = defaultdict(float)
        for sid, w in weights.items():
            for doc in self.idx.docs[sid]:
                tf = self.idx.tf(sid, doc, term)
                if tf:
                    out[doc] += w * scoring.bm25(
                        tf, df, self.idx.n_docs, self.idx.dl(sid, doc), self._avgdl[sid]
                    )
        return dict(out)

    def _phrase_docs(self, tokens: list[str], offsets: list[int], weights) -> set[int]:
        docs = set()
        for sid in weights:
            for doc in self.idx.docs[sid]:
                plists = [
                    set(p - off for p in self.idx.positions(sid, doc, t))
                    for t, off in zip(tokens, offsets)
                ]
                if all(plists) and set.intersection(*plists):
                    docs.add(doc)
        return docs

    def _near_docs(self, tokens, offsets, max_iv, weights) -> set[int]:
        from groonga_spark.query.engine import _near_window

        docs = set()
        for sid in weights:
            for doc in self.idx.docs[sid]:
                lists = [
                    [p - off for p in self.idx.positions(sid, doc, t)]
                    for t, off in zip(tokens, offsets)
                ]
                if all(lists) and _near_window(lists, max_iv):
                    docs.add(doc)
        return docs

    def _multi_token_scores(
        self, tokens: list[str], docs: set[int], weights
    ) -> dict[int, float]:
        out: dict[int, float] = {}
        uniq = list(dict.fromkeys(tokens))
        for doc in docs:
            s = 0.0
            for t in uniq:
                ts = self._term_scores(t, weights)
                s += ts.get(doc, 0.0)
            out[doc] = s
        return out

    def _adjust_tail(self, toks, offs):
        """GET-mode trailing-gram correction — mirrors
        SearchEngine._adjust_ngram_tail (engine.py) so rank identity holds
        for n-gram tokenizers: drop the redundant short tail gram; a lone
        short token becomes prefix-matchable."""
        from groonga_spark.tokenize import _NGRAM_VARIANTS

        tok = self.idx.tokenizer
        n = 2 if tok == "regexp" else _NGRAM_VARIANTS.get(tok, (0, (), False))[0]
        if n < 2 or not toks or len(toks[-1]) >= n:
            return toks, offs, False
        if len(toks) > 1:
            return toks[:-1], offs[:-1], False
        return toks, offs, True

    def _prefix_scores(self, pfx: str, weights) -> dict[int, float]:
        exp = sorted(t for t in self.idx.terms() if t.startswith(pfx))
        out: dict[int, float] = defaultdict(float)
        for t in exp:
            for d, s in self._term_scores(t, weights).items():
                out[d] += s
        return dict(out)

    def _eval(self, node, weights) -> dict[int, float]:
        if isinstance(node, qp.Term):
            toks, offs = self._get_tokens(node.text)
            if node.prefix:
                assert len(toks) == 1
                return self._prefix_scores(toks[0], weights)
            toks, offs, as_pfx = self._adjust_tail(toks, offs)
            if as_pfx:
                return self._prefix_scores(toks[0], weights)
            if len(toks) == 1:
                return self._term_scores(toks[0], weights)
            docs = self._phrase_docs(toks, offs, weights)
            return self._multi_token_scores(toks, docs, weights)
        if isinstance(node, qp.Phrase):
            toks, offs = self._get_tokens(node.text)
            toks, offs, as_pfx = self._adjust_tail(toks, offs)
            if as_pfx:
                return self._prefix_scores(toks[0], weights)
            if len(toks) == 1:
                return self._term_scores(toks[0], weights)
            docs = self._phrase_docs(toks, offs, weights)
            return self._multi_token_scores(toks, docs, weights)
        if isinstance(node, qp.Near):
            toks, offs = self._get_tokens(node.text)
            if len(toks) > 1:
                toks, offs, _ = self._adjust_tail(toks, offs)
            docs = self._near_docs(toks, offs, node.max_interval, weights)
            return self._multi_token_scores(toks, docs, weights)
        if isinstance(node, qp.And):
            res = [self._eval(c, weights) for c in node.children]
            keys = set(res[0])
            for r in res[1:]:
                keys &= set(r)
            return {d: sum(r.get(d, 0.0) for r in res) for d in keys}
        if isinstance(node, qp.Or):
            res = [self._eval(c, weights) for c in node.children]
            keys = set()
            for r in res:
                keys |= set(r)
            return {d: sum(r.get(d, 0.0) for r in res) for d in keys}
        if isinstance(node, qp.Not):
            pos = self._eval(node.positive, weights)
            neg = self._eval(node.negative, weights)
            return {d: s for d, s in pos.items() if d not in neg}
        raise TypeError(node)

    def select(self, query: str, match_columns: str | None = None, k: int = 10):
        ast = qp.parse_query(query)
        if match_columns is None:
            weights = {sid: 1.0 for sid in self.idx.sections}
        else:
            col_to_sid = {c: s for s, c in self.idx.sections.items()}
            weights = {
                col_to_sid[c]: w for c, w in qp.parse_match_columns(match_columns)
            }
        scores = self._eval(ast, weights)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
