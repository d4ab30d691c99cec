"""Groonga query-syntax parser.

Re-implements the published grammar of Groonga's ``--query`` syntax
(reference ``lib/expr.c:5832`` parse_query, ``get_word_`` expr.c:5722-5826,
``get_op`` expr.c:5493-5538): space-separated terms AND-combine, ``OR``
combines alternatives, ``-term`` negates, ``"..."`` is a positional phrase,
``( )`` groups, a trailing ``*`` asks for prefix expansion
(GRN_QUERY_PREFIX, groonga.h:1067).  ``*N<k>`` prefix pragma selects NEAR
mode with max_interval k (expr.c:5592-5639).

Column operators (``get_word_`` expr.c:5722-5826 → ``get_op``
expr.c:5493-5538): a word of the form ``column:value`` applies an operator
to a named column instead of the default match —

    ``column:value``   EQUAL          ``column:!value``  NOT EQUAL
    ``column:<v``      LESS           ``column:>v``      GREATER
    ``column:<=v``     LESS-EQUAL     ``column:>=v``     GREATER-EQUAL
    ``column:@sub``    MATCH          ``column:^pfx``    PREFIX
    ``column:$sfx``    SUFFIX         ``column:~re``     REGEXP

Leading pragmas (expr.c:5592-5639): ``*E<n>`` escalation threshold,
``*D+ / *DOR / *D-`` default operator for space-separated words,
``*W<sid>[:w],...`` section weights, ``*S"text"`` similar search,
``*T"text"`` term-extract — exposed through :func:`parse_query_ex`.
"""

from __future__ import annotations

import re

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


@dataclass
class ColumnOp:
    """``column:value`` word (get_word_ expr.c:5722-5826)."""

    column: str
    op: str  # equal|not_equal|less|greater|less_equal|greater_equal|match|prefix|suffix|regexp
    value: str
    quoted: bool = False  # quoted value → never numeric-coerced


@dataclass
class Pragmas:
    """Leading ``*X`` pragmas (expr.c:5592-5639)."""

    escalation_threshold: int | None = None  # *E<n>
    default_op: str = "and"  # *D+ / *DOR / *D-  → and | or | and_not
    weights: dict[int, float] | None = None  # *W<sid>[:w],...
    mode: str | None = None  # *S → "similar", *T → "term_extract"
    similarity_threshold: int | None = None  # *S<n> (grn_select_optarg)
    text: str | None = None  # the rest of the query for *S / *T
    force_exact: bool = False  # *X → EXACT mode, no escalation (expr.c:5526)


@dataclass
class Nothing:
    """A syntactically tolerated but unsatisfiable expression — a dangling
    trailing ``OR`` makes the whole query match NOTHING in the reference
    (rc 0, zero hits; suite/select/query_expander/column/*/or_at_the_end),
    not an error and not the left operand alone."""


@dataclass
class AllRecords:
    """Implicit positive clause under ALLOW_LEADING_NOT: ``-term`` alone
    means every record minus the matches (grn_expr flags,
    include/groonga/groonga.h GRN_EXPR_ALLOW_LEADING_NOT)."""


class QueryParseError(ValueError):
    pass


# --query_flags (grn_expr_parse flags; select default is
# ALLOW_PRAGMA|ALLOW_COLUMN, lib/proc.c).  ALLOW_UPDATE is accepted for
# interface parity but is a no-op here: it only affects script-syntax
# assignment, which the --query grammar cannot express.
QUERY_FLAGS = frozenset(
    {"ALLOW_PRAGMA", "ALLOW_COLUMN", "ALLOW_UPDATE", "ALLOW_LEADING_NOT"}
)
DEFAULT_QUERY_FLAGS = frozenset({"ALLOW_PRAGMA", "ALLOW_COLUMN"})


def parse_flags(spec) -> frozenset:
    """``"ALLOW_COLUMN|ALLOW_LEADING_NOT"`` → flag set; None → select's
    default; ``"NONE"`` → empty."""
    if spec is None:
        return DEFAULT_QUERY_FLAGS
    if isinstance(spec, (set, frozenset)):
        flags = frozenset(spec)
    else:
        flags = frozenset(
            p.strip() for p in spec.split("|") if p.strip() and p.strip() != "NONE"
        )
    unknown = flags - QUERY_FLAGS
    if unknown:
        raise QueryParseError(f"unknown query_flags {sorted(unknown)}")
    return flags


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
            # phrase; \x inside is a literal x (GRN_QUERY_ESCAPE,
            # lib/expr.c get_phrase)
            j, buf = i + 1, []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    buf.append(q[j + 1])
                    j += 2
                else:
                    buf.append(q[j])
                    j += 1
            if j >= n:
                raise QueryParseError(f"unterminated phrase in {q!r}")
            toks.append(("PHRASE", "".join(buf)))
            i = j + 1
        elif c == "\\" and i + 1 < n:
            # escaped leading char starts a WORD (expr.c get_word: the
            # char after GRN_QUERY_ESCAPE is literal — '\(foo\)' is the
            # term "(foo)", not a group)
            i = _lex_word(q, i, toks)
        elif c == "-":
            toks.append(("MINUS", c))
            i += 1
        elif c == "+":
            toks.append(("PLUS", c))
            i += 1
        else:
            i = _lex_word(q, i, toks)
    return toks


def _lex_word(q: str, i: int, toks: list[tuple[str, str]]) -> int:
    """Scan one WORD starting at ``i``; returns the index past it.

    A word may embed a quoted span (column:@"multi word") — the quotes
    travel with the word and parse_primary strips them.  ``\\x`` is the
    literal char x (GRN_QUERY_ESCAPE, expr.c get_word): it joins the word
    even if it is a space/paren/operator char.  A word whose special chars
    (':' anywhere, '*' first or last) were ALL escaped is emitted as
    WORDLIT — a plain term never reinterpreted as column-op, pragma, or
    prefix query."""
    n = len(q)
    j = i
    parts: list[str] = []
    literal = False  # saw an escape that disarms colop/pragma/prefix
    while j < n:
        c = q[j]
        if c == "\\" and j + 1 < n:
            nc = q[j + 1]
            parts.append(nc)
            if nc == ":" or nc == "*":
                literal = True
            j += 2
            continue
        if c.isspace() or c in "()":
            break
        if c == '"':
            k = q.find('"', j + 1)
            if k < 0:
                raise QueryParseError(f"unterminated quote in {q!r}")
            parts.append(q[j : k + 1])
            j = k + 1
        else:
            parts.append(c)
            j += 1
    w = "".join(parts)
    if w == "OR":
        toks.append(("OR", w))
    else:
        toks.append(("WORDLIT" if literal else "WORD", w))
    return j


_COLOP_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_.]*):(.+)$", re.DOTALL)

# operator symbol → name, longest-first (get_op, expr.c:5493-5538)
_COLOP_SYMS = (
    ("<=", "less_equal"),
    (">=", "greater_equal"),
    ("<", "less"),
    (">", "greater"),
    ("!", "not_equal"),
    ("@", "match"),
    ("^", "prefix"),
    ("$", "suffix"),
    ("~", "regexp"),
)


def _parse_colop(word: str) -> ColumnOp | None:
    m = _COLOP_RE.match(word)
    if not m:
        return None
    col, rest = m.groups()
    op, value = "equal", rest
    for sym, name in _COLOP_SYMS:
        if rest.startswith(sym):
            op, value = name, rest[len(sym) :]
            break
    quoted = len(value) >= 2 and value[0] == '"' and value[-1] == '"'
    if quoted:
        value = value[1:-1]
    if not value and not quoted:
        return None  # 'col:' with no value is a plain term; 'col:""' is
        # an empty-string EQUAL (select/index/equal/empty_string)
    return ColumnOp(col, op, value, quoted=quoted)


class _Parser:
    def __init__(
        self,
        toks: list[tuple[str, str]],
        default_op: str = "and",
        allow_column: bool = True,
        allow_leading_not: bool = False,
    ):
        self.toks = toks
        self.i = 0
        self.default_op = default_op
        self.allow_column = allow_column
        self.allow_leading_not = allow_leading_not

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
            if self.peek()[0] in ("EOF", "RP"):
                # dangling OR: the whole expression matches nothing
                # (query_expander/*/or_at_the_end — rc 0, zero hits)
                return Nothing()
            alts.append(self.parse_and())
        return alts[0] if len(alts) == 1 else Or(alts)

    def parse_and(self):
        pos: list = []
        neg: list = []
        while self.peek()[0] in ("WORD", "WORDLIT", "PHRASE", "LP", "MINUS", "PLUS"):
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
            if self.allow_leading_not and neg:
                # ALLOW_LEADING_NOT: all records minus the matches; each
                # surviving record scores 1.0 like any scan-path predicate
                pos = [AllRecords()]
            else:
                raise QueryParseError("query has no positive clause")
        # *D pragma: the operator joining space-separated words
        # (expr.c:5592-5639 — *D+ AND, *DOR OR, *D- AND_NOT)
        if self.default_op == "or":
            positive = pos[0] if len(pos) == 1 else Or(pos)
        elif self.default_op == "and_not":
            positive = pos[0]
            for p in pos[1:]:
                positive = Not(positive, p)
        else:
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
                # NEAR/NEAR2 pragma applies to the rest of the query
                # string; the operand may ride in the same token as a
                # quoted phrase — *N"a b", *N5"a b" (expr.c:5592-5639)
                m = re.match(r"\*([Nn])(\d*)", val)
                tail = val[m.end() :]
                if len(tail) >= 2 and tail[0] == '"' and tail[-1] == '"':
                    tail = tail[1:-1]
                parts = ([tail] if tail else []) + [
                    v for _, v in self.toks[self.i :]
                ]
                self.i = len(self.toks)
                k = int(m.group(2)) if m.group(2) else 10
                return Near(" ".join(parts), k, no_offset=m.group(1) == "n")
            if self.allow_column:
                colop = _parse_colop(val)
                if colop is not None:
                    return colop
            if val.endswith("*") and len(val) > 1:
                return Term(val[:-1], prefix=True)
            return Term(val)
        if kind == "WORDLIT":
            # word whose special chars were backslash-escaped: always a
            # plain term (never colop / pragma / prefix)
            return Term(val)
        raise QueryParseError(f"unexpected token {kind}")


def parse_query_ex(q: str, flags=None) -> tuple[object, Pragmas]:
    """Parse leading pragmas then the query body.  For ``*S``/``*T`` mode
    pragmas the AST is None and ``pragmas.text`` carries the payload.
    ``flags`` is a --query_flags spec (see :func:`parse_flags`)."""
    fl = parse_flags(flags)
    prag = Pragmas()
    toks = _lex(q)
    if not toks:
        raise QueryParseError("empty query")
    i = 0
    while (
        "ALLOW_PRAGMA" in fl
        and i < len(toks)
        and toks[i][0] == "WORD"
        and toks[i][1].startswith("*")
    ):
        w = toks[i][1]
        if len(w) < 2:
            break
        c = w[1]
        if c in ("N", "n"):  # NEAR pragma: handled by the body parser
            break
        if c == "E":
            try:
                prag.escalation_threshold = int(w[2:])
            except ValueError:
                raise QueryParseError(f"bad *E pragma {w!r}")
            i += 1
            continue
        if c == "D":
            op = {"+": "and", "OR": "or", "-": "and_not"}.get(w[2:])
            if op is None:
                raise QueryParseError(f"bad *D pragma {w!r}")
            prag.default_op = op
            i += 1
            continue
        if c == "W":
            weights: dict[int, float] = {}
            try:
                for part in w[2:].split(","):
                    if ":" in part:
                        s, wt = part.split(":", 1)
                        weights[int(s)] = float(wt)
                    else:
                        weights[int(part)] = 1.0
            except ValueError:
                raise QueryParseError(f"bad *W pragma {w!r}")
            prag.weights = weights
            i += 1
            continue
        if c == "X":
            # force exact mode (expr.c:5526-5531): op=AND, mode=EXACT —
            # disables match escalation; the body may be glued (*Xfoo)
            prag.force_exact = True
            rest = w[2:]
            if rest:
                toks[i] = ("WORD", rest)
            else:
                i += 1
            break
        if c in ("S", "T"):
            prag.mode = "similar" if c == "S" else "term_extract"
            rest = w[2:]
            # *S<n>: n is the similarity_threshold — the number of rarest
            # query terms used for matching (ii.c:5892-5897)
            mt = re.match(r"\d+", rest)
            if mt:
                prag.similarity_threshold = int(mt.group(0))
                rest = rest[mt.end() :]
            tail = " ".join(v for _, v in toks[i + 1 :])
            prag.text = f"{rest} {tail}".strip().strip('"').strip()
            if not prag.text:
                raise QueryParseError(f"*{c} pragma needs text")
            return None, prag
        break
    body = toks[i:]
    if not body:
        raise QueryParseError("query has only pragmas")
    p = _Parser(
        body,
        default_op=prag.default_op,
        allow_column="ALLOW_COLUMN" in fl,
        allow_leading_not="ALLOW_LEADING_NOT" in fl,
    )
    node = p.parse_or()
    if p.peek()[0] != "EOF":
        raise QueryParseError(f"trailing tokens in {q!r}")
    return node, prag


def parse_query(q: str):
    node, prag = parse_query_ex(q)
    if node is None:
        raise QueryParseError(
            f"mode pragma *{'S' if prag.mode == 'similar' else 'T'} has no AST; "
            "use parse_query_ex"
        )
    return node


_COLOP_SIGIL = {
    "equal": "", "not_equal": "!", "less": "<", "greater": ">",
    "less_equal": "<=", "greater_equal": ">=", "match": "@",
    "prefix": "^", "suffix": "$", "regexp": "~",
}

_TERM_SPECIALS = re.compile(r'([\\"():*+~<>^$!@-])')  # and ':' below


def ast_to_query(node) -> str:
    """Serialize a parsed AST back to ``--query`` syntax — the inverse of
    :func:`parse_query` for the node forms the parser emits (query
    expansion splices substitution snippets into the AST and re-emits the
    query; get_word-level expansion, reference lib/expr.c:5686-5720)."""

    def wrap(c) -> str:
        s = ast_to_query(c)
        return f"({s})" if isinstance(c, (And, Or, Not)) else s

    if isinstance(node, Term):
        t = _TERM_SPECIALS.sub(r"\\\1", node.text)
        return t + "*" if node.prefix else t
    if isinstance(node, Phrase):
        return '"' + node.text.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(node, Near):
        q = node.text.replace("\\", "\\\\").replace('"', '\\"')
        return f'*{"n" if node.no_offset else "N"}{node.max_interval}"{q}"'
    if isinstance(node, ColumnOp):
        v = node.value
        if node.quoted:
            v = '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
        return f"{node.column}:{_COLOP_SIGIL[node.op]}{v}"
    if isinstance(node, And):
        return " ".join(wrap(c) for c in node.children)
    if isinstance(node, Or):
        return " OR ".join(wrap(c) for c in node.children)
    if isinstance(node, Not):
        if isinstance(node.positive, AllRecords):
            return "- " + wrap(node.negative)
        return wrap(node.positive) + " - " + wrap(node.negative)
    if isinstance(node, AllRecords):
        return "_id:>0"  # matches every record (ids are 1-based)
    if isinstance(node, Nothing):
        return "(x OR)"  # re-parses to Nothing (dangling OR)
    raise QueryParseError(f"unserializable node {node!r}")


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
