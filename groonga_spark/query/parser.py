"""Groonga query-syntax parser (subset).

Re-implements the published grammar of Groonga's ``--query`` syntax
(reference ``lib/expr.c:5832`` parse_query, ``get_word_`` expr.c:5722-5826,
``get_op`` expr.c:5493-5538): space-separated terms AND-combine, ``OR``
combines alternatives, ``-term`` negates, ``"..."`` is a positional phrase,
``( )`` groups, a trailing ``*`` asks for prefix expansion
(GRN_QUERY_PREFIX, groonga.h:1067).  ``*N<k>`` prefix pragma selects NEAR
mode with max_interval k (expr.c:5592-5639).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Term:
    text: str
    prefix: bool = False


@dataclass
class Phrase:
    text: str  # tokenized at plan time with the index's tokenizer


@dataclass
class Near:
    text: str
    max_interval: int = 10  # default max_interval (lib/expr.c:3553)
    # NEAR2 (*n): positions compared WITHOUT query-offset correction
    # (token_info_clear_offset, ii.c:6364-6366,5639-5644)
    no_offset: bool = False


@dataclass
class And:
    children: list = field(default_factory=list)


@dataclass
class Or:
    children: list = field(default_factory=list)


@dataclass
class Not:
    positive: object = None
    negative: object = None


class QueryParseError(ValueError):
    pass


def _lex(q: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            toks.append(("LP", c))
            i += 1
        elif c == ")":
            toks.append(("RP", c))
            i += 1
        elif c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise QueryParseError(f"unterminated phrase in {q!r}")
            toks.append(("PHRASE", q[i + 1 : j]))
            i = j + 1
        elif c == "-":
            toks.append(("MINUS", c))
            i += 1
        elif c == "+":
            toks.append(("PLUS", c))
            i += 1
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in '()"':
                j += 1
            w = q[i:j]
            if w == "OR":
                toks.append(("OR", w))
            else:
                toks.append(("WORD", w))
            i = j
    return toks


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("EOF", "")

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse_or(self):
        left = self.parse_and()
        alts = [left]
        while self.peek()[0] == "OR":
            self.take()
            alts.append(self.parse_and())
        return alts[0] if len(alts) == 1 else Or(alts)

    def parse_and(self):
        pos: list = []
        neg: list = []
        while self.peek()[0] in ("WORD", "PHRASE", "LP", "MINUS", "PLUS"):
            kind, _ = self.peek()
            negate = False
            if kind == "MINUS":
                self.take()
                negate = True
            elif kind == "PLUS":
                self.take()
            node = self.parse_primary()
            (neg if negate else pos).append(node)
        if not pos:
            raise QueryParseError("query has no positive clause")
        positive = pos[0] if len(pos) == 1 else And(pos)
        for n in neg:
            positive = Not(positive, n)
        return positive

    def parse_primary(self):
        kind, val = self.take()
        if kind == "LP":
            node = self.parse_or()
            if self.take()[0] != "RP":
                raise QueryParseError("missing )")
            return node
        if kind == "PHRASE":
            return Phrase(val)
        if kind == "WORD":
            if val.startswith("*N") or val.startswith("*n"):
                # NEAR/NEAR2 pragma applies to the rest of the query string
                rest = " ".join(v for _, v in self.toks[self.i :])
                self.i = len(self.toks)
                k = val[2:]
                return Near(rest, int(k) if k else 10, no_offset=val[1] == "n")
            if val.endswith("*") and len(val) > 1:
                return Term(val[:-1], prefix=True)
            return Term(val)
        raise QueryParseError(f"unexpected token {kind}")


def parse_query(q: str):
    toks = _lex(q)
    if not toks:
        raise QueryParseError("empty query")
    p = _Parser(toks)
    node = p.parse_or()
    if p.peek()[0] != "EOF":
        raise QueryParseError(f"trailing tokens in {q!r}")
    return node


def parse_match_columns(spec: str) -> list[tuple[str, float]]:
    """``'path * 2 || content'`` → [('path', 2.0), ('content', 1.0)]
    (weighted match_columns, lib/expr.c:5225-5253)."""
    out = []
    for part in spec.split("||"):
        part = part.strip()
        if "*" in part:
            col, w = part.split("*", 1)
            out.append((col.strip(), float(w.strip())))
        else:
            out.append((part, 1.0))
    return out
