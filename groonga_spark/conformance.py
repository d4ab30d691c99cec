"""grntest-style conformance runner: execute the reference's own
``.test`` command scripts and compare against their ``.expected`` output.

The reference validates itself with 1265 golden command scripts
(``test/command/suite/**``; runner ``test/command/run-test.sh``).  Each
``.test`` file is a sequence of commands (DDL, ``load`` with inline JSON,
``select …``); the ``.expected`` file interleaves every command with its
JSON response.  This module parses that format, replays the script
against a :class:`~groonga_spark.commands.CommandContext`, and compares
each ``select`` response's (n_hits, column names, row values) — the
direct "matches the reference's results on its own test queries" check.

Scope: the command subset this engine implements (``table_create``,
``column_create``, ``load``, ``select``); scripts using geo, mecab,
plugins, or mruby are out of scope and rejected by :func:`parse_script`.

Semantics mapped per fixture conventions:

- ``_id`` is the 1-based load order (grn array/hash id assignment for
  these append-only scripts) — the runner injects it at load time.
- default ``--output_columns`` is ``_id, _key, <scalar columns>``
  (``GRN_SELECT_DEFAULT_OUTPUT_COLUMNS``), records in id order.
- ``_score`` uses the reference's default tf scorer (integer counts),
  engine ``scorer="tf"``.
- a ``TABLE_PAT_KEY`` lexicon with ``--default_tokenizer`` plus a
  ``COLUMN_INDEX`` column declares which source columns are fulltext-
  indexed and with which tokenizer; the runner builds the engine over
  those columns on first ``select --query/--match_columns``.
"""

from __future__ import annotations

import json
import re

from dataclasses import dataclass, field

from pyspark.errors import PySparkException

from .commands import CommandContext
from .query.parser import QueryParseError
from .query.script import ScriptSyntaxError

# exception kinds a select may legitimately map to a reference error
# response (rc<0)
_SELECT_ERRORS = (QueryParseError, ScriptSyntaxError, PySparkException)

# Groonga type → Spark SQL type (db.c builtin types)
TYPE_MAP = {
    "ShortText": "string",
    "Text": "string",
    "LongText": "string",
    "Int8": "long",
    "Int16": "long",
    "Int32": "long",
    "Int64": "long",
    "UInt8": "long",
    "UInt16": "long",
    "UInt32": "long",
    "UInt64": "long",
    "Float": "double",
    "Bool": "boolean",
    "Time": "double",
    # geo points live as their canonical "latxlng" msec text (geo.py)
    "TokyoGeoPoint": "string",
    "WGS84GeoPoint": "string",
}

# reference tokenizer name → our registry key (tokenize.py)
TOKENIZER_MAP = {
    "TokenBigram": "bigram",
    "TokenUnigram": "unigram",
    "TokenTrigram": "trigram",
    "TokenBigramSplitSymbol": "bigram_split_symbol",
    "TokenBigramSplitSymbolAlpha": "bigram_split_symbol_alpha",
    "TokenBigramSplitSymbolAlphaDigit": "bigram_split_symbol_alpha_digit",
    "TokenBigramIgnoreBlank": "bigram_ignore_blank",
    "TokenBigramIgnoreBlankSplitSymbol": "bigram_ignore_blank_split_symbol",
    "TokenBigramIgnoreBlankSplitSymbolAlpha": "bigram_ignore_blank_split_symbol_alpha",
    "TokenBigramIgnoreBlankSplitSymbolAlphaDigit": (
        "bigram_ignore_blank_split_symbol_alpha_digit"
    ),
    "TokenDelimit": "delimit",
    "TokenDelimitNull": "delimit_null",
    "TokenRegexp": "regexp",
}

_CMD_RE = re.compile(r"^[a-z][a-z0-9_]*(\s|$)")

_GEO_BARE = re.compile(r"\s*geo_in_(circle|rectangle)\s*\(")


def _bare_geo_call(f: str) -> "tuple[str, list[str]] | None":
    """``(kind, top-level args)`` when the ENTIRE filter is one
    ``geo_in_circle(…)`` / ``geo_in_rectangle(…)`` call — the form the
    reference plans through the geo-index selector (grn_selector_geo_*,
    lib/geo.c:747-841).  Wrapped forms (``… > 0``, boolean operators)
    evaluate sequentially instead and return None here."""
    m = _GEO_BARE.match(f)
    if m is None:
        return None
    depth, i, args, buf, q = 1, m.end(), [], [], None
    while i < len(f):
        c = f[i]
        if q:
            if c == "\\" and i + 1 < len(f):
                buf.append(f[i : i + 2])
                i += 2
                continue
            if c == q:
                q = None
            buf.append(c)
        elif c in "\"'":
            q = c
            buf.append(c)
        elif c == "(":
            depth += 1
            buf.append(c)
        elif c == ")":
            depth -= 1
            if depth == 0:
                args.append("".join(buf).strip())
                return (m.group(1), args) if not f[i + 1 :].strip() else None
            buf.append(c)
        elif c == "," and depth == 1:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
        i += 1
    return None

_SELECTOR_CALL = re.compile(r"\b(sub_filter|query)\s*\(")

_UNESC = {"b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t"}


def unesc_tokens(line: str) -> list[str]:
    """Command-line tokenizer (grn_text_unesc_tok, reference
    lib/str.c:2306): space-separated tokens, '…'/"…" quoting, and ``\\x``
    escapes resolved in BOTH bare and quoted tokens (b/f/n/r/t → control
    chars, anything else → the literal char).  This is one unescape level
    ABOVE the --query grammar's own GRN_QUERY_ESCAPE — a .test line
    ``--query '\\\\(foo\\\\)'`` delivers ``\\(foo\\)`` to the parser.
    Unlike shlex, '(' and ')' are single-char tokens outside quotes."""
    toks: list[str] = []
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c == " ":
            i += 1
            continue
        buf: list[str] = []
        if c in "\"'":
            quote = c
            i += 1
            while i < n and line[i] != quote:
                if line[i] == "\\" and i + 1 < n:
                    buf.append(_UNESC.get(line[i + 1], line[i + 1]))
                    i += 2
                else:
                    buf.append(line[i])
                    i += 1
            i += 1  # past the closing quote
        elif c in "()":
            buf.append(c)
            i += 1
        else:
            while i < n and line[i] not in " \"'()":
                if line[i] == "\\" and i + 1 < n:
                    buf.append(_UNESC.get(line[i + 1], line[i + 1]))
                    i += 2
                else:
                    buf.append(line[i])
                    i += 1
        toks.append("".join(buf))
    return toks


def _join_continuations(text: str) -> str:
    """Fold grntest ``\\``-continued command lines into one line (both the
    ``.test`` script and the ``.expected`` echo use them)."""
    out: list[str] = []
    cont = False
    for line in text.splitlines():
        if cont:
            out[-1] = out[-1][:-1].rstrip() + " " + line.lstrip()
        else:
            out.append(line)
        cont = out[-1].endswith("\\")
    return "\n".join(out)


class Unsupported(Exception):
    """Script uses a command/argument outside the supported subset."""


@dataclass
class _Table:
    keyed: bool = False
    key_type: str = "string"
    key_gtype: str = "ShortText"  # groonga key type name (output headers)
    flags: str = ""  # raw TABLE_* flag string from table_create
    columns: list = field(default_factory=list)  # [(name, spark_type)]
    vector_cols: set = field(default_factory=set)
    next_id: int = 1
    # fulltext declaration: indexed source columns + tokenizer key
    indexed_cols: list = field(default_factory=list)
    tokenizer: str | None = None
    # declared --default_tokenizer when this table is used as a lexicon
    lex_tokenizer: str | None = None
    # lexicon properties of the index over indexed_cols
    untok_index: bool = False  # lexicon without a tokenizer → whole values
    lex_sis: bool = False  # lexicon has KEY_WITH_SIS
    # storage mirror for natural-order computation (tiny, conformance only)
    keys: list = field(default_factory=list)  # insertion order, incl. SIS
    rows: list = field(default_factory=list)  # [{col: value}] incl. _id/_key
    types: dict = field(default_factory=dict)  # column → groonga type name
    ref_cols: dict = field(default_factory=dict)  # column → referenced table
    vector_ref_cols: dict = field(default_factory=dict)  # vector ref → table
    index_cols: dict = field(default_factory=dict)  # index col → (src table, src col)
    # dump reconstruction info (grn dump, proc.c:6868)
    tokenizer_raw: str | None = None  # --default_tokenizer as given
    normalizer_raw: str | None = None  # --normalizer as given
    col_defs: list = field(default_factory=list)  # (name, flags_raw, gtype)
    key_normalize: bool = False  # KEY_NORMALIZE flag / --normalizer
    loaded: bool = False  # a parquet snapshot exists (possibly empty)
    # grn object bookkeeping (table_list/column_list output)
    oid: int = 0  # grn object id (user objects start at 256)
    col_oids: dict = field(default_factory=dict)  # column name → object id
    value_type: str | None = None  # table_create's 4th positional (range)
    key_declared: bool = False  # an explicit key type was given
    token_filters: list = field(default_factory=list)  # --token_filters
    # COLUMN_VECTOR|WITH_WEIGHT columns: the row mirror stores the loaded
    # {value: weight} object; the parquet frame carries the VALUES array
    # (so every vector op works unchanged) and weights apply at scoring /
    # output time (grn weight vector — select/match_columns/weight/*)
    weight_vector_cols: set = field(default_factory=set)

    @property
    def pat(self) -> bool:
        return "TABLE_PAT_KEY" in self.flags

    @property
    def dat(self) -> bool:
        return "TABLE_DAT_KEY" in self.flags

    @property
    def sis(self) -> bool:
        return "KEY_WITH_SIS" in self.flags


def sis_order(keys: list[str], start: str) -> list[str]:
    """Traversal order of a pat-trie SIS (semi-infinite string) suffix
    search (grn_pat_suffix_search, reference lib/pat.c): starting at the
    searched key, depth-first over the SIS back-links — children of key k
    are the existing keys one char longer that end with k, visited
    newest-insertion-first.  Derived from the key orders in
    test/command/suite/select/query/suffix_search/*_with_sis.expected."""
    present = set(keys)
    idx = {k: i for i, k in enumerate(keys)}
    out: list[str] = []

    def visit(k: str) -> None:
        out.append(k)
        kids = [k2 for k2 in present if len(k2) == len(k) + 1 and k2.endswith(k)]
        for k2 in sorted(kids, key=lambda x: -idx[x]):
            visit(k2)

    if start in present:
        visit(start)
    return out


def sis_expand(values: list[str]) -> list[str]:
    """Insertion-order key list of a KEY_WITH_SIS pat trie after adding
    ``values``: each value registers itself, then its proper suffixes
    longest-first, skipping keys already present."""
    seen: set[str] = set()
    out: list[str] = []
    for v in values:
        for k in (v[i:] for i in range(len(v))):
            if k and k not in seen:
                seen.add(k)
                out.append(k)
    return out


#: grntest resolves ``#@include`` paths against the test base directory
INCLUDE_BASE = "/root/reference/test/command"


def parse_script(text: str) -> list[tuple[str, list[str], str | None]]:
    """``.test`` text → [(raw_command_line, argv, payload_json|None)].

    grntest directives (``#@…``, ``#$…``) and comments are skipped —
    except ``#@include <path>``, which splices the referenced fixture
    script (resolved against :data:`INCLUDE_BASE`); a ``load`` command
    consumes the following bracket-balanced JSON block as its payload.
    """
    import os

    def expand(t: str, depth: int = 0) -> str:
        if depth > 4 or "#@include" not in t:
            return t
        out_lines = []
        for line in t.splitlines():
            m = re.match(r"#@include\s+(\S+)", line.strip())
            if m:
                p = os.path.join(INCLUDE_BASE, m.group(1))
                if not os.path.exists(p):
                    raise Unsupported(f"missing include {m.group(1)}")
                with open(p) as f:
                    out_lines.append(expand(f.read(), depth + 1))
            else:
                out_lines.append(line)
        return "\n".join(out_lines)

    out = []
    lines = _join_continuations(expand(text)).splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        i += 1
        if line.strip().startswith("#@omit"):
            # grntest skips #@omit-marked fixtures entirely
            raise Unsupported(f"omitted fixture: {line.strip()[6:].strip()}")
        msd = re.match(r"#@suggest-create-dataset\s+(\S+)", line.strip())
        if msd:
            # grntest runs groonga-suggest-create-dataset; the runner
            # instantiates the dataset mirror (suggest_dataset.py)
            out.append(
                (line.rstrip(), ["#suggest-create-dataset", msd.group(1)], None)
            )
            continue
        mcp = re.match(r"#@copy-path\s+(\S+)\s+(\S+)", line.strip())
        if mcp:
            # grntest copies a fixture file into the test tmp dir (e.g.
            # the QueryExpanderTSV synonyms file)
            out.append((line.rstrip(), ["#copy-path", *mcp.groups()], None))
            continue
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        murl = re.match(r"/d/(\w+)(?:\.json)?\?(\S*)$", line.strip())
        if murl:
            # HTTP URL command form (lib/proc.c grn_document_root):
            # /d/<cmd>.json?k=v&k2=v2 — jsonp via the callback param
            # (response/jsonp)
            from urllib.parse import parse_qsl

            argv = [murl.group(1)]
            # parse_qsl already percent/plus-decodes values
            for k, v in parse_qsl(murl.group(2), keep_blank_values=True):
                argv += [f"--{k}", v]
            out.append((line.rstrip(), argv, None))
            continue
        if not _CMD_RE.match(line):
            raise Unsupported(f"unparseable line {line!r}")
        argv = unesc_tokens(line)
        payload = None
        if argv[0] == "load" and "--values" not in argv:
            # inline --values carries the rows; no payload block follows
            block, depth, started = [], 0, False
            while i < len(lines):
                l2 = lines[i]
                i += 1
                block.append(l2)
                depth += l2.count("[") + l2.count("{")
                depth -= l2.count("]") + l2.count("}")
                started = started or depth > 0
                if started and depth == 0:
                    break
            payload = "\n".join(block)
        out.append((line.rstrip(), argv, payload))
    return out


def parse_expected(
    text: str, commands: "list[str] | None" = None
) -> dict[str, object]:
    """``.expected`` text → {command_line: parsed JSON response}.

    Responses follow their echoed command; a load's input JSON is echoed
    too, so the response of ``load`` is the LAST json line before the
    next command.  Multi-line (pretty-printed) responses are joined.

    ``commands`` (the script's real command sequence) anchors the parse:
    a ``dump`` response CONTAINS command-looking lines, so echo detection
    by shape alone mis-chunks — with the sequence known, only lines
    matching the next expected commands are boundaries.
    """
    lines = _join_continuations(text).splitlines()
    if commands is not None:
        want = [re.sub(r"\s+", " ", c.strip()) for c in commands]
        cmd_idx = []
        wi = 0
        for k, l in enumerate(lines):
            n = re.sub(r"\s+", " ", l.strip())
            # the echo must match one of the UPCOMING commands (in order)
            for j in range(wi, len(want)):
                if n == want[j]:
                    cmd_idx.append(k)
                    wi = j + 1
                    break
    else:
        # indices of echoed command lines (shape-based)
        cmd_idx = [k for k, l in enumerate(lines) if _CMD_RE.match(l)]
    res: dict[tuple, object] = {}
    seen: dict[str, int] = {}
    for j, k in enumerate(cmd_idx):
        end = cmd_idx[j + 1] if j + 1 < len(cmd_idx) else len(lines)
        # grntest log annotations (#|e| error echo, #>/#< traces) ride
        # between responses — drop them before JSON-parsing
        chunk = [l for l in lines[k + 1 : end] if not l.lstrip().startswith("#")]
        cmd = lines[k].rstrip()
        # key = (normalized command, occurrence #): the same line may run
        # twice (dump before/after table_remove) with DIFFERENT responses
        norm = re.sub(r"\s+", " ", cmd.strip())
        occ = seen.get(norm, 0)
        seen[norm] = occ + 1
        if not chunk:
            continue
        key = (norm, occ)
        if cmd.startswith("load"):
            res[key] = json.loads(chunk[-1])
        else:
            # raw_decode: take the first JSON document; multi-line #|e|
            # error annotations continue past their '#' line and would
            # otherwise corrupt the parse.  A non-JSON response body
            # (``dump`` emits a command script) is kept as raw text.
            try:
                res[key] = json.JSONDecoder().raw_decode("\n".join(chunk))[0]
            except ValueError:
                res[key] = ("#text", "\n".join(chunk))
    return res


class _Resp:
    """A non-select command's response body, compared verbatim against the
    reference's recorded JSON body (``table_create`` → ``true``, ``load`` →
    record count, ``tokenize`` → token list, …).  The sentinel body
    ``"ERROR"`` matches any reference response with rc != 0."""

    __slots__ = ("body",)

    def __init__(self, body):
        self.body = body

    def __repr__(self):
        return f"_Resp({self.body!r})"


def select_result(response):
    """Parsed select response → [(n_hits, column names, rows), …] — one
    tuple per result table (main result, then one per drilldown; LABELED
    drilldowns ride as a dict {label: tuple}) — or the sentinel
    ``("ERROR",)`` when the reference reported a non-zero rc
    (e.g. -63 syntax error — suite/select/query/invalid/*)."""
    if response[0][0] != 0:
        return ("ERROR",)

    def table(body):
        return (body[0][0], [c[0] for c in body[1]], body[2:])

    tables = []
    for body in response[1]:
        if isinstance(body, dict):
            tables.append({label: table(b) for label, b in body.items()})
        else:
            tables.append(table(body))
    return tables


_JST = __import__("datetime").timezone(__import__("datetime").timedelta(hours=9))

_TIME_LIT_RE = re.compile(r'"(\d{4}[-/]\d{2}[-/]\d{2} \d{2}:\d{2}:\d{2}(?:\.\d+)?)"')


def _parse_time(s: str) -> float:
    """Groonga Time literal → epoch seconds.  grntest runs with
    TZ=Asia/Tokyo (reference test/command/run-test.sh:152), so naive
    datetime strings in fixtures are JST."""
    import datetime

    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S",
                "%Y/%m/%d %H:%M:%S.%f", "%Y/%m/%d %H:%M:%S"):
        try:
            return (
                datetime.datetime.strptime(s, fmt)
                .replace(tzinfo=_JST)
                .timestamp()
            )
        except ValueError:
            continue
    raise Unsupported(f"time literal {s!r}")


_INT_WIDTH = {"Int8": 8, "UInt8": 8, "Int16": 16, "UInt16": 16,
              "Int32": 32, "UInt32": 32, "Int64": 64, "UInt64": 64}


def _split_output_columns(s: str) -> list[str]:
    """Split an ``--output_columns`` spec on TOP-LEVEL commas only —
    function calls carry commas inside parens and string literals."""
    out: list[str] = []
    cur: list[str] = []
    depth = 0
    q: str | None = None
    esc = False
    for ch in s:
        if q:
            cur.append(ch)
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == q:
                q = None
            continue
        if ch in "\"'":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
            continue
        cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


class _OutExpr:
    """Evaluator for script expressions in ``--output_columns`` — a
    presentation-layer feature (grn_select output formatting, proc.c):
    literals, column refs, ``&&``/``||`` with Groonga VALUE semantics
    (``a && b`` → b if a is truthy else a; ``a || b`` → a if truthy else
    b — suite/select/filter/logical_operation), comparison and C-integer
    arithmetic evaluated in the first column operand's stored width with
    wraparound (``value / -1`` on INT32_MIN stays INT32_MIN —
    suite/select/filter/arithmetic_operation/slash).  Row matching is
    always engine-side; this only renders extra output columns."""

    _TOK = re.compile(
        r'\s*("(?:\\.|[^"])*"|\'(?:\\.|[^\'])*\'|\d+\.\d+|\d+|[A-Za-z_][\w.]*|'
        r"\|\||&&|>>>|<<|>>|[!=<>]=|[-+*/%&|^<>()!,])"
    )

    def __init__(self, expr: str, types: dict):
        self.toks = self._TOK.findall(expr)
        self.types = types  # column → groonga type name
        self.fctx: dict = {}  # function context (query keywords)
        # output column name: a leading column ref names the column, a
        # function call names it after the function; anything else is
        # anonymous ("" in the reference output)
        if len(self.toks) > 1 and self.toks[1] == "(" and re.fullmatch(
            r"[A-Za-z_]\w*", self.toks[0]
        ):
            self.name = self.toks[0]
        else:
            self.name = (
                self.toks[0]
                if self.toks and self.toks[0] in types or
                   (self.toks and self.toks[0].split(".")[0] in types)
                else ""
            )
        self.cols = [
            tk.split(".")[0]
            for tk in self.toks
            if tk.split(".")[0] in types
            or tk.split(".")[0] in ("_id", "_key", "_score")
        ]

    @staticmethod
    def _truthy(v) -> bool:
        return not (v is None or v is False or v == 0)

    def _width(self) -> int:
        for c in self.toks:
            if c in self.types and self.types[c] in _INT_WIDTH:
                return _INT_WIDTH[self.types[c]]
        return 32

    def _wrap(self, v):
        if not isinstance(v, int) or isinstance(v, bool):
            return v
        w = self._width()
        return ((v + (1 << (w - 1))) % (1 << w)) - (1 << (w - 1))

    def eval(self, row: dict):
        self.i = 0
        v = self._or(row)
        return self._wrap(v)

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _or(self, row):
        v = self._and(row)
        had = False
        while self._peek() == "||":
            had = True
            self.i += 1
            r = self._and(row)
            v = v if self._truthy(v) else r
        # a null outcome of a logical chain renders as false
        # (logical_operation/or/all_null → false)
        return False if had and v is None else v

    def _and(self, row):
        v = self._cmp(row)
        had = False
        while self._peek() == "&&":
            had = True
            self.i += 1
            r = self._cmp(row)
            v = r if self._truthy(v) else v
        return False if had and v is None else v

    def _cmp(self, row):
        v = self._add(row)
        while self._peek() in ("==", "!=", "<", ">", "<=", ">="):
            op = self.toks[self.i]
            self.i += 1
            r = self._add(row)
            v = {"==": v == r, "!=": v != r, "<": v < r, ">": v > r,
                 "<=": v <= r, ">=": v >= r}[op]
        return v

    def _add(self, row):
        v = self._mul(row)
        while self._peek() in ("+", "-", "|", "^", "&", "<<", ">>", ">>>"):
            op = self.toks[self.i]
            self.i += 1
            r = self._mul(row)
            if op == ">>>":
                w = self._width()
                v = (v & ((1 << w) - 1)) >> r
            elif op == "<<":
                v = v << r
            elif op == ">>":
                v = v >> r
            else:
                v = {"+": lambda a, b: a + b, "-": lambda a, b: a - b,
                     "|": lambda a, b: a | b, "^": lambda a, b: a ^ b,
                     "&": lambda a, b: a & b}[op](v, r)
        return v

    def _mul(self, row):
        v = self._unary(row)
        while self._peek() in ("*", "/", "%"):
            op = self.toks[self.i]
            self.i += 1
            r = self._unary(row)
            if op == "*":
                v = v * r
            elif (
                isinstance(v, int) and isinstance(r, int)
                and not isinstance(v, bool) and not isinstance(r, bool)
            ):
                # C semantics: truncate toward zero
                q, m = abs(v) // abs(r), abs(v) % abs(r)
                sign = -1 if (v < 0) != (r < 0) else 1
                v = sign * q if op == "/" else (m if v >= 0 else -m)
            else:
                v = v / r if op == "/" else v % r
        return v

    def _unary(self, row):
        tk = self._peek()
        if tk == "-":
            self.i += 1
            return -self._unary(row)
        if tk == "!":
            self.i += 1
            return not self._truthy(self._unary(row))
        if tk == "(":
            self.i += 1
            v = self._or(row)
            if self._peek() != ")":
                raise Unsupported("unbalanced output expression")
            self.i += 1
            return v
        self.i += 1
        if tk is None:
            raise Unsupported("empty output expression")
        if re.fullmatch(r"[A-Za-z_]\w*", tk) and self._peek() == "(":
            self.i += 1  # past '('
            args = []
            if self._peek() != ")":
                args.append(self._or(row))
                while self._peek() == ",":
                    self.i += 1
                    args.append(self._or(row))
            if self._peek() != ")":
                raise Unsupported("unbalanced output function call")
            self.i += 1
            return self._call(tk, args)
        if tk.startswith('"'):
            return json.loads(tk)
        if tk.startswith("'"):
            body = tk[1:-1].replace("\\'", "'").replace('\\"', '"')
            return json.loads('"' + body.replace('"', '\\"') + '"')
        if tk in ("true", "false"):
            return tk == "true"
        if tk == "null":
            return None
        if re.fullmatch(r"\d+\.\d+", tk):
            return float(tk)
        if tk.isdigit():
            return int(tk)
        base = tk.split(".")[0]
        if base in self.types or base in ("_id", "_key", "_score"):
            v = row.get(base)
            for part in tk.split(".")[1:]:
                v = None if v is None else v[part]
            return v
        raise Unsupported(f"output expression token {tk!r}")

    def _call(self, name: str, args: list):
        """Output-column function calls (proc.c GRN_PROC_FUNCTION procs).
        snippet/highlight keywords come from the select condition
        (grn_expr_get_keywords) via ``fctx``."""
        from . import snip

        kws = self.fctx.get("keywords", [])
        if name == "snippet_html":
            if len(args) != 1:
                return None
            return snip.snippet_html(args[0] or "", kws) if kws else None
        if name == "highlight_html":
            if len(args) != 1 or args[0] is None:
                return None
            # no keywords → still HTML-escapes the whole text
            # (highlight_html/empty_query, no_query)
            return snip.highlight_html(args[0], kws)
        if name == "highlight_full":
            if len(args) < 3:
                return None
            if isinstance(args[1], str) and args[1] not in (
                "", "NormalizerAuto"
            ):
                # a non-normalizer name is a hard error (rc -22,
                # highlight_full/invalid/not_normalizer)
                raise ScriptSyntaxError(f"not normalizer: {args[1]}")
            return snip.highlight_full(args[0] or "", *args[1:])
        if name == "html_untag":
            v = args[0]
            if v is not None and not isinstance(v, (str, int, float)):
                # a record reference doesn't cast to text (rc -22,
                # html_untag/cast_failure)
                raise ScriptSyntaxError("failed to cast to text")
            return re.sub(r"<[^>]*>", "", str(v) if v is not None else "")
        if name == "vector_size":
            return len(args[0] or [])
        if name == "edit_distance":
            a, b = str(args[0] or ""), str(args[1] or "")
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i] + [0] * len(b)
                for j, cb in enumerate(b, 1):
                    cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                                 prev[j - 1] + (ca != cb))
                prev = cur
            return prev[-1]
        raise Unsupported(f"output function {name}")


def _grn_char_type(ch: str) -> str:
    """Groonga char-type name for the ``normalize … WITH_TYPES`` output
    (lib/proc.c grn_char_type names: null/alpha/digit/symbol/hiragana/
    katakana/kanji/others)."""
    o = ord(ch)
    if o < 0x80:
        if ch.isalpha():
            return "alpha"
        if ch.isdigit():
            return "digit"
        if ch.isspace():
            return "others"
        return "symbol"
    if 0x3041 <= o <= 0x309F:
        return "hiragana"
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF:
        return "katakana"
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
        return "kanji"
    return "others"


def _try_cast(v, ty: str):
    """(ok, value) — ok False when the reference's cast would fail
    (unparsable string into a numeric type, an object value)."""
    if isinstance(v, dict):
        return False, None
    if ty in ("long", "int", "double", "float") and isinstance(v, str):
        try:
            float(v)
        except ValueError:
            return False, None
    return True, _cast_load_value(v, ty)


def _cast_load_value(v, ty: str):
    """grn_obj_cast semantics for load values (lib/db.c grn_obj_cast):
    bool → 1/0 into numeric columns, numeric strings parse, a failed cast
    stores the type default (0 / 0.0 / "") and only logs — the record
    itself still loads (suite/load/bool/cast/*, load/invalid/int32)."""
    if ty.startswith("array<"):
        elem = ty[6:-1]
        if isinstance(v, list):
            # a vector element whose cast fails is DROPPED, not defaulted
            # (load/invalid/in_mid_brace/vector: [1,"GARBAGE",3] → [1,3])
            out = []
            for x in v:
                ok, cv = _try_cast(x, elem)
                if ok:
                    out.append(cv)
            return out
        # scalar into a vector column → one-element vector
        return [_cast_load_value(v, elem)]
    if ty in ("long", "int"):
        if isinstance(v, bool):
            return 1 if v else 0
        if isinstance(v, int):
            return v
        if isinstance(v, float):
            return int(v)
        if isinstance(v, str):
            try:
                return int(v.strip() or 0)
            except ValueError:
                return 0
        return 0
    if ty in ("double", "float"):
        if isinstance(v, bool):
            return 1.0 if v else 0.0
        if isinstance(v, (int, float)):
            return float(v)
        if isinstance(v, str):
            try:
                return float(v)
            except ValueError:
                return 0.0
        return 0.0
    if ty == "boolean":
        return bool(v)
    if ty == "string":
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return str(v)
        return v
    return v


def _grn_sort_value(
    entries: "list[tuple[object, float]]", offset: int, limit: int
) -> list:
    """Replay grn_table_sort_value's partial quicksort exactly
    (db.c:10271; pack_value / part_value / sort_value db.c:10184-10260)
    and return the ids of the fully-packed array — the caller slices
    [offset:offset+limit].

    ``entries`` = (id, value) in TABLE CURSOR order, values pre-negated
    for DESC keys.  compare(a,b) is "a sorts after b" (strict >); ties
    compare False, and pack fills the tail region BACKWARD from the end,
    which is what scrambles equal-valued records into the
    implementation-defined order the reference's goldens record
    (select/sort/index)."""
    n = len(entries)
    if n == 0:
        return []
    arr: list = [None] * n

    def cmp(a, b) -> bool:
        return a[1] > b[1]

    c0 = entries[0]
    head, tail = 0, n - 1
    for e0 in entries[1:]:
        if cmp(c0, e0):
            arr[head] = e0
            head += 1
        else:
            arr[tail] = e0
            tail -= 1
    arr[head] = c0
    ep = head if n > 2 else None
    to = offset + limit

    def part(b: int, e: int) -> "int | None":
        if cmp(arr[b], arr[e]):
            arr[b], arr[e] = arr[e], arr[b]
        d = e - b
        if d < 2:
            return None
        c = b + (d >> 1)
        if cmp(arr[b], arr[c]):
            arr[b], arr[c] = arr[c], arr[b]
        elif cmp(arr[c], arr[e]):
            arr[c], arr[e] = arr[e], arr[c]
        if d < 3:
            return None
        b += 1
        arr[b], arr[c] = arr[c], arr[b]
        c = b
        while True:
            b += 1
            while cmp(arr[c], arr[b]):
                b += 1
            e -= 1
            while cmp(arr[e], arr[c]):
                e -= 1
            if b >= e:
                break
            arr[b], arr[e] = arr[e], arr[b]
        arr[c], arr[e] = arr[e], arr[c]
        return e

    def sortv(h: int, t_: int, frm: int, to_: int) -> None:
        if h < t_:
            c = part(h, t_)
            if c is None:
                return
            m = c - h + 1
            if frm < m - 1:
                sortv(h, c - 1, frm, to_)
            if m < to_:
                sortv(c + 1, t_, frm - m, to_ - m)

    if ep is not None:
        m = ep + 1
        if offset < m - 1:
            sortv(0, ep - 1, offset, to)
        if m < to:
            sortv(ep + 1, n - 1, offset - m, to - m)
    return [x[0] for x in arr]


def _norm_key(s: str) -> str:
    """Key comparison form under KEY_NORMALIZE / NormalizerAuto for
    natural-order ranking."""
    from .normalize import normalize

    return normalize(s)


class ConformanceRunner:
    def __init__(self, spark, db_path: str):
        self.ctx = CommandContext(spark, db_path)
        self.spark = spark
        self.tables: dict[str, _Table] = {}
        # (lexicon, name, flags, src_table, sources) in creation order
        self.index_defs: list[tuple] = []
        self.plugins: list[str] = []  # plugin_register order (dump echoes)
        self.fixture_files: dict[str, str] = {}  # #@copy-path dst → src
        # grn object ids: every created table/column takes the next id
        # (user objects start at 256 — table_list/column_list output)
        self._next_oid = 256
        # ``truncate Lexicon.index_col`` drops that index's postings while
        # the lexicon keys stay: source _ids whose postings were cleared,
        # keyed (lexicon, index column) (truncate/column/index)
        self.trunc_index_ids: dict[tuple[str, str], set] = {}
        # #@suggest-create-dataset mirrors (suggest_dataset.py)
        self.suggest_datasets: dict[str, object] = {}

    def _alloc_oid(self) -> int:
        oid = self._next_oid
        self._next_oid += 1
        return oid

    @staticmethod
    def _obj_path(oid: int) -> str:
        # db file path of a persistent object: db/db.%07x
        return f"db/db.{oid:07x}"

    # -- command handlers --------------------------------------------------
    def _kw(self, argv: list[str]) -> tuple[list[str], dict[str, str]]:
        pos, kw = [], {}
        k = 1
        while k < len(argv):
            if argv[k].startswith("--"):
                # a --param immediately followed by another --param (or
                # nothing) carries an EMPTY value — the reference's command
                # parser does not swallow the next flag as the value
                # (select/function/highlight_html/empty_column:
                # `--output_columns --query '…'`)
                nxt = argv[k + 1] if k + 1 < len(argv) else "--"
                if nxt.startswith("--"):
                    kw[argv[k][2:]] = ""
                    k += 1
                else:
                    kw[argv[k][2:]] = nxt
                    k += 2
            else:
                pos.append(argv[k])
                k += 1
        return pos, kw

    def table_create(self, argv) -> bool:
        pos, kw = self._kw(argv)
        name, flags = pos[0], pos[1] if len(pos) > 1 else "TABLE_HASH_KEY"
        t = _Table(keyed="NO_KEY" not in flags, flags=flags)
        t.key_normalize = "KEY_NORMALIZE" in flags or "normalizer" in kw
        if "default_tokenizer" in kw:
            tok = TOKENIZER_MAP.get(kw["default_tokenizer"])
            if tok is None:
                if kw["default_tokenizer"] in ("TokenMecab", "TokenKytea"):
                    raise Unsupported(f"tokenizer {kw['default_tokenizer']}")
                # an unregistered tokenizer name is silently DROPPED — the
                # table creates fine without one
                # (table_create/default_tokenizer/nonexistent)
                kw.pop("default_tokenizer")
            else:
                t.lex_tokenizer = tok
        if t.keyed and len(pos) > 2:
            kt = TYPE_MAP.get(pos[2])
            if kt is None and pos[2] in self.tables:
                # a table as key type: keys are that table's keys
                # (dump/schema/table/*/reference_key); an UNKEYED (array)
                # table is referenced by record id (UInt32)
                rt = self.tables[pos[2]]
                kt = rt.key_type if rt.keyed else "long"
            if kt is None:
                raise Unsupported(f"key type {pos[2]}")
            t.key_type = kt
            t.key_gtype = pos[2]
            t.key_declared = True
        t.tokenizer_raw = kw.get("default_tokenizer")
        norm = kw.get("normalizer")
        raw_norm = norm
        if norm == "NormalizerNFKC51":
            # NFKC51 = plain NFKC (Unicode 5.1) — same ASCII behavior as
            # NormalizerAuto's LUT (lowercase, blank fold); served by the
            # Auto implementation, dumped under its own name
            norm = "NormalizerAuto"
        if norm is not None and norm != "NormalizerAuto":
            # an unregistered normalizer name is silently DROPPED — the
            # table creates fine without it (column_create/index/source/
            # multi_column/trailing_space: --normalizer NomralizerAuto)
            norm = None
            t.key_normalize = "KEY_NORMALIZE" in flags
        t.normalizer_raw = (raw_norm if norm else None) or (
            "NormalizerAuto" if "KEY_NORMALIZE" in flags else None
        )
        if t.keyed and len(pos) > 3:
            t.value_type = pos[3]
        if kw.get("value_type"):
            t.value_type = kw["value_type"]
        if t.value_type and TYPE_MAP.get(t.value_type):
            # the fixed-size record value reads/writes as the _value
            # pseudo-column (select/output/value/uint64); it is not a data
            # column — no col_defs entry, so dump/column_list skip it and
            # the default output filters it below
            t.columns.append(("_value", TYPE_MAP[t.value_type]))
            t.types["_value"] = t.value_type
        bad_tf = False
        if kw.get("token_filters"):
            names = kw["token_filters"].split(",")
            if any(not s.strip() for s in names):
                # "[table][create][token-filter] empty token filter name":
                # the command errors but the table IS created, without
                # token filters (table_create/token_filters/*_comma)
                bad_tf = True
            else:
                t.token_filters = [s.strip() for s in names]
        t.oid = self._alloc_oid()
        self.tables[name] = t
        return False if bad_tf else True

    def column_create(self, argv) -> bool:
        pos, kw = self._kw(argv)
        table, name, flags = pos[0], pos[1], pos[2]
        if table not in self.tables:
            return False  # the owning table_create failed → rc error
        if "COLUMN_INDEX" in flags:
            # column_create Lexicon idx COLUMN_INDEX|… SourceTable col[,col]
            lex = self.tables[table]
            src_table = pos[3]
            sources = [
                s.strip() for s in (kw.get("source") or pos[4]).split(",")
            ]
            if src_table not in self.tables:
                lex.index_cols[name] = (src_table, sources[0])
                return False
            st = self.tables[src_table]
            # source validation (grn_obj_set_info GRN_INFO_SOURCE,
            # column_create/index/source/*): every source must be _key or
            # an existing data column (never _id); when the lexicon's key
            # is a table REFERENCE, the source value domain must be that
            # same table
            for sc in sources:
                if sc == "_id" or (sc != "_key" and sc not in st.types):
                    return False
                if lex.key_gtype in self.tables:
                    dom = st.key_gtype if sc == "_key" else st.types.get(sc)
                    if dom != lex.key_gtype:
                        return False
            if len(sources) > 1 and "WITH_SECTION" not in flags:
                # multi-column sources need WITH_SECTION
                # (column_create/index/source/multi_column/without_section)
                return False
            # remember the reverse reference: sub_filter(idx, "expr") walks
            # the index back to the source records (func_sub_filter)
            lex.index_cols[name] = (src_table, sources[0])
            lex.col_oids[name] = self._alloc_oid()
            self.index_defs.append(
                (table, name, flags, src_table, ",".join(sources))
            )
            if st.rows:
                # OFFLINE build: indexing an already-loaded table registers
                # its values' tokens as lexicon keys (load/index/offline/*)
                self._index_autoregister(src_table, st.rows)
            t = self.tables[src_table]
            t.indexed_cols.extend(s for s in sources if s not in t.indexed_cols)
            if all(
                s in t.ref_cols or s in t.vector_ref_cols for s in sources
            ):
                # a reverse-reference index (Comments.article over
                # Articles.comment) carries no tokenizer for TEXT match —
                # it must not clobber the table's fulltext tokenizer
                # (index/nested/by_column/with_top_level_index)
                return
            # a lexicon with no --default_tokenizer indexes WHOLE values
            # (one key per value; suffix_search/…_index_with_sis.test,
            # escape/prefix_search.test) — TokenDelimitNull on \0-free text
            # is exactly that: the full normalized value as a single token
            t.tokenizer = self._lex_engine_tokenizer(lex)
            t.untok_index = lex.lex_tokenizer is None
            t.lex_sis = lex.sis
            return
        # lexicon data columns register like any other (they dump and
        # column_list normally — dump/record/table_tokenizer_index_column)
        t = self.tables[table]
        t.col_oids[name] = self._alloc_oid()
        gtype = pos[3] if len(pos) > 3 else "ShortText"
        t.col_defs.append((name, flags, gtype))
        typ = TYPE_MAP.get(gtype)
        if typ is None and gtype in self.tables:
            # reference column: stored as a struct of the referenced
            # record's _key + scalar columns so that script dotted access
            # (bookmark.title) compiles to Spark struct field access.
            # An UNKEYED (array) table is referenced by record id, so the
            # struct leads with _id:long instead (table_remove/array/*).
            ref = self.tables[gtype]
            keyf = ("_key", ref.key_type) if ref.keyed else ("_id", "long")
            if "COLUMN_VECTOR" in flags:
                # vector of references (tag column): an array of the
                # referenced keys; match ops evaluate per element
                t.columns.append((name, f"array<{keyf[1]}>"))
                t.types[name] = gtype
                t.vector_cols.add(name)
                t.vector_ref_cols[name] = gtype
                if "WITH_WEIGHT" in flags:
                    t.weight_vector_cols.add(name)
                return
            parts = [f"{keyf[0]}:{keyf[1]}"] + [
                f"`{n}`:{ty}" for n, ty in ref.columns if n not in ref.ref_cols
            ]
            t.columns.append((name, f"struct<{','.join(parts)}>"))
            t.types[name] = gtype
            t.ref_cols[name] = gtype
            return
        if typ is None:
            raise Unsupported(f"type {gtype}")
        t.types[name] = gtype
        if "COLUMN_VECTOR" in flags:
            t.vector_cols.add(name)
            t.columns.append((name, f"array<{typ}>"))
            if "WITH_WEIGHT" in flags:
                t.weight_vector_cols.add(name)
        else:
            t.columns.append((name, typ))

    def load(self, argv, payload):
        pos, kw = self._kw(argv)
        table = kw["table"]
        if "values" in kw and not (payload or "").strip():
            payload = kw["values"]
        # raw_decode: the reference's JSON reader stops at the closing
        # bracket and ignores trailing garbage (filter/invalid/match/
        # argument/column ends its payload with a stray `"`)
        def _pairs(pairs):
            # a JSON object with a DUPLICATED key is rejected whole
            # (load/array/duplicated_id_key — the reference counts 0)
            d = dict(pairs)
            if len(d) != len(pairs):
                d["__reject__"] = True
            return d

        rows = json.JSONDecoder(object_pairs_hook=_pairs).raw_decode(
            payload.strip()
        )[0]
        if kw.get("columns"):
            # --columns names the positional slots; an unknown name is a
            # hard error, nothing loads (load/columns/nonexistent)
            names = [c.strip() for c in kw["columns"].split(",") if c.strip()]
            t = self.tables[table]
            known = set(t.types) | {"_key", "_id"}
            if any(n not in known for n in names):
                raise ScriptSyntaxError(
                    f"nonexistent column in --columns: {names}"
                )
            rows = [names] + [r for r in rows if isinstance(r, list)]
        # columns-as-first-row form: [["a","b"],[1,2],...] — the header is
        # a non-empty list of names; a bare [] is ONE record with all
        # defaults (suite/select/filter/no_index/score/*)
        if rows and isinstance(rows[0], list):
            if rows[0] and all(isinstance(x, str) for x in rows[0]):
                header = rows[0]
                # a positional row with the wrong arity is REJECTED (the
                # reference counts 3 of 4 when one row is short —
                # select/index/nested/by_column/hash)
                rows = [
                    dict(zip(header, r))
                    for r in rows[1:]
                    if len(r) == len(header)
                ]
            elif all(r == [] for r in rows):
                rows = [{} for _ in rows]
            else:
                raise Unsupported("positional load rows without a header")
        if kw.get("each"):
            # load --each 'col = expr': the expression runs once per
            # loaded record with the record as scope (grn_load,
            # lib/proc.c:1371; load/each/*).  The suite's each-exprs are
            # single assignments; geo_distance is the one function used.
            m = re.fullmatch(
                r"\s*(\w+)\s*=\s*geo_distance\(\s*(\w+)\s*,\s*"
                r"[\"']([^\"']*)[\"']\s*\)\s*",
                kw["each"],
            )
            if not m:
                raise Unsupported(f"load --each {kw['each']!r}")
            tgt, src, lit = m.groups()
            from . import geo as _geo

            t = self.tables[table]
            ref = _geo.parse_geopoint(lit)
            for r in rows:
                if isinstance(r, dict) and isinstance(r.get(src), str):
                    try:
                        d = _geo.distance_py(
                            _geo.parse_geopoint(r[src]), ref
                        )
                    except _geo.GeoParseError:
                        continue
                    # assignment casts to the target column's storage
                    # type (UInt32 in the fixtures — C truncation)
                    r[tgt] = (
                        int(d) if t.types.get(tgt) != "Float" else d
                    )
        # the response counts APPLIED payload records (updates included,
        # rejected rows and SIS/auto-registered extras excluded)
        return self._ingest(table, rows)

    def _ref_struct(self, ref: "_Table", key) -> dict:
        """Struct value of a reference column pointing at ``key``: the
        referenced record's _key plus its scalar columns (dotted access
        ``refcol.attr`` then works as Spark struct field access)."""
        if not ref.keyed:
            # array-table reference: the stored value is the record id
            rid = int(key) if str(key).strip() not in ("", "0") else 0
            rec = next((r for r in ref.rows if r.get("_id") == rid), {})
            out = {"_id": rid}
            for n, _ty in ref.columns:
                if n not in ref.ref_cols:
                    out[n] = rec.get(n)
            return out
        if ref.key_normalize and isinstance(key, str):
            key = _norm_key(key)
        if key == "" and ref.key_type != "string":
            # unset reference into a numeric-keyed table: typed default
            key = 0 if ref.key_type == "long" else 0.0
        rec = next(
            (r for r in ref.rows if str(r.get("_key", "")) == str(key)), {}
        )
        out = {"_key": key}
        for n, _ty in ref.columns:
            if n not in ref.ref_cols:
                out[n] = rec.get(n)
        return out

    @staticmethod
    def _lex_engine_tokenizer(lex: "_Table") -> str:
        """Engine tokenizer for an index LEXICON: its own tokenizer,
        downgraded to the raw (class-less, case-sensitive) n-gram mode
        when it has NO normalizer; an untokenized lexicon indexes whole
        values, normalized when the lexicon normalizes
        (suffix_search/…_index_with_sis, table_create/normalizer/auto,
        select/query_expander/column/*/quoted_or)."""
        from .tokenize import _NGRAM_VARIANTS

        tok = lex.lex_tokenizer
        if tok is None:
            return "delimit_null_norm" if lex.key_normalize else "delimit_null"
        if tok in _NGRAM_VARIANTS and lex.normalizer_raw is None:
            n = _NGRAM_VARIANTS[tok][0]
            return {1: "unigram_raw", 2: "bigram_raw", 3: "trigram_raw"}[n]
        return tok

    def _tsv_synonyms(self) -> "dict[str, list[str]] | None":
        """Synonym mapping from a #@copy-path'd TSV fixture (the
        QueryExpanderTSV plugin's file format: key TAB snippet TAB …)."""
        import os

        for _dst, src in self.fixture_files.items():
            if not src.endswith(".tsv") or not os.path.exists(src):
                continue
            mp: dict[str, list[str]] = {}
            with open(src, encoding="utf-8") as f:
                for line in f:
                    line = line.rstrip("\n")
                    if not line or line.startswith("#"):
                        continue
                    parts = line.split("\t")
                    if len(parts) >= 2:
                        mp[parts[0]] = parts[1:]
            return mp
        return None

    def _index_posting_counts(
        self, tname: str, t: "_Table", iname: str
    ) -> dict:
        """Per-key value a lexicon's INDEX column renders as in select
        output: grn_ii_estimate_size (ii.c:4470).  A single inline posting
        (df 1, tf 1) reads 1; a buffered term reads
        ``a[1] + size_in_buffer + 2`` where size_in_buffer counts buffer
        RECORDS (one per record×section insertion, ii.c:2050) and a[1] is
        the stale first-inline position — the first posting's token
        position when WITH_POSITION and that posting had tf 1, else 0
        (token_filters/stem/all_upper: I→4, DEVELOP→7, GROONGA→8;
        delete/index/fix_size_column: df 1 → 1, deleted → 0)."""
        entry = next(
            (
                d for d in self.index_defs
                if d[0] == tname and d[1] == iname
            ),
            None,
        )
        if entry is None:
            return {}
        _lex, _n, fl, src, sources = entry
        st = self.tables.get(src)
        if st is None:
            return {}
        excluded = self.trunc_index_ids.get((tname, iname), set())
        apply_stem = "TokenFilterStem" in t.token_filters
        from .tokenize import tokenize as _tok_pc
        if apply_stem:
            from .stem import stem_token as _stem_pc

        # key -> [n_records, first_pos, tf_of_first_record]
        stats: dict[str, list[int]] = {}
        for r in st.rows:  # insertion (= id) order for these scripts
            if r.get("_id") in excluded:
                continue
            for sc in sources.split(","):
                v = r.get("_key") if sc == "_key" else r.get(sc)
                vals = list(v) if isinstance(v, (list, dict)) else [v]
                # one grn_ii_update_one per record×section → one buffer
                # record per key here, however many occurrences (tf)
                per: dict[str, tuple[int, int]] = {}
                for x in vals:
                    if x in (None, ""):
                        continue
                    if t.lex_tokenizer:
                        toks = [
                            (str(tk), p) for tk, p in _tok_pc(
                                str(x), self._lex_engine_tokenizer(t)
                            )
                        ]
                        if apply_stem:
                            toks = [(_stem_pc(tk), p) for tk, p in toks]
                    elif t.key_normalize and isinstance(x, str):
                        toks = [(_norm_key(x), 0)]
                    else:
                        toks = [(str(x), 0)]
                    for tk, p in toks:
                        if tk in per:
                            per[tk] = (per[tk][0], per[tk][1] + 1)
                        else:
                            per[tk] = (p, 1)
                for tk, (fp, tf) in per.items():
                    s = stats.get(tk)
                    if s is None:
                        stats[tk] = [1, fp, tf]
                    else:
                        s[0] += 1
        lut: dict[str, int] = {}
        for tk, (n, fp, tf1) in stats.items():
            if n == 1 and tf1 == 1:
                lut[tk] = 1
            else:
                # the stale inline slot keeps the first posting's token
                # position even for a WITH_SECTION-only index
                # (select/sort/index: "."→5+3+2=10, ":"→1+3+2=6)
                lut[tk] = (fp if tf1 == 1 else 0) + n + 2
        return lut

    def _index_autoregister(self, table: str, rows: list[dict]) -> None:
        """Register ``rows``' source values as LEXICON keys for every
        index over ``table``: tokens of the lexicon's tokenizer (raw
        sliding n-grams when it has NO normalizer — no character classes),
        or the whole (normalized) value for an untokenized index
        (grn_ii update path — dump/record/table_tokenizer_index_column,
        table_create/default_tokenizer/bigram/default)."""
        for lex, _iname, _fl, src, sources in self.index_defs:
            if src != table or lex == table:
                continue
            lt = self.tables.get(lex)
            if lt is None:
                continue
            known_keys = set(lt.keys)
            reg: list[dict] = []
            for r in rows:
                for sc in sources.split(","):
                    v = r.get(sc)
                    if isinstance(v, dict):
                        v = list(v)  # weight vector: register the values
                    for x in v if isinstance(v, list) else [v]:
                        if x in (None, ""):
                            continue
                        if lt.lex_tokenizer:
                            from .tokenize import tokenize as _tok_one

                            toks = [
                                tk for tk, _p in _tok_one(
                                    str(x),
                                    self._lex_engine_tokenizer(lt),
                                )
                            ]
                            if "TokenFilterStem" in lt.token_filters:
                                from .stem import stem_token as _stem_ar

                                toks = [_stem_ar(tk) for tk in toks]
                        elif lt.key_normalize and isinstance(x, str):
                            toks = [_norm_key(x)]
                        else:
                            toks = [x]
                        for tk in toks:
                            if str(tk) not in known_keys:
                                known_keys.add(str(tk))
                                # __auto__ marks keys that exist only
                                # because indexing registered them — dump
                                # omits such lexicons' records (they
                                # reconstruct from reindex)
                                reg.append({"_key": tk, "__auto__": True})
            if reg:
                self._ingest(lex, reg)

    def _ingest(self, table: str, rows: list[dict]) -> int:
        t = self.tables[table]
        if t.keyed and t.key_normalize and t.key_type == "string":
            # the key trie stores NORMALIZED keys (KEY_NORMALIZE /
            # --normalizer NormalizerAuto) — selects output them normalized
            for r in rows:
                if "_key" in r:
                    r["_key"] = _norm_key(str(r["_key"]))
        time_cols = [n for n, ty in t.columns if t.types.get(n) == "Time"]
        geo_cols = [
            n for n, ty in t.columns
            if t.types.get(n) in ("TokyoGeoPoint", "WGS84GeoPoint")
        ]
        if t.keyed and t.key_gtype in ("TokyoGeoPoint", "WGS84GeoPoint"):
            # geo-keyed trie: keys canonicalize to msec form
            from . import geo as _geo

            for r in rows:
                if "_key" in r:
                    r["_key"] = _geo.canonical(str(r["_key"]))
        for r in rows:
            for n in list(r):
                if n in ("_key", "_id") or not isinstance(r[n], dict):
                    continue
                if n in t.weight_vector_cols:
                    # weight vector: {value: weight}; a plain array loads
                    # with weight 0 (load/vector/add/weight/*)
                    r[n] = {str(k): int(v) for k, v in r[n].items()}
                else:
                    # "columns except weight vector column don't support
                    # object value": the VALUE is dropped, the record
                    # still loads (load/vector/add/weight/*/invalid/*)
                    r.pop(n)
            for n in t.weight_vector_cols:
                if isinstance(r.get(n), list):
                    # plain array → weight 0; dump round-trip form
                    # [{value: weight}, …] merges back into one object
                    d: dict = {}
                    for x in r[n]:
                        if isinstance(x, dict):
                            d.update({str(k): int(v) for k, v in x.items()})
                        else:
                            d[str(x)] = 0
                    r[n] = d
            for n in time_cols:
                if isinstance(r.get(n), str):
                    s = r[n].strip()
                    if re.fullmatch(r"-?\d+(\.\d+)?", s):
                        # numeric strings cast as epoch seconds
                        # (load/time/cast/string/epoch/*)
                        r[n] = float(s)
                    else:
                        try:
                            r[n] = _parse_time(s)
                        except Unsupported:
                            # "failed to cast to <Time>": value dropped,
                            # record loads (load/invalid/in_mid_*/scalar)
                            r.pop(n)
                elif isinstance(r.get(n), bool):
                    # bool→Time casts through the raw MICROsecond value
                    # (true = 1 µs — load/bool/cast/time expects 1e-06)
                    r[n] = (1.0 if r[n] else 0.0) / 1e6
            for n in geo_cols:
                # text → geo point canonical msec form; any other source
                # type (or a bad string) fails the cast and stores the
                # type default "0x0" (load/bool/cast/tokyo_geo_point).
                # Vector geo columns canonicalize per element, dropping
                # failed casts like any vector element
                # (load/index/online/vector/wgs84_geo_point)
                if n in r:
                    from . import geo as _geo

                    def _geo_cast(v):
                        try:
                            return (
                                _geo.canonical(str(v))
                                if isinstance(v, str)
                                else None
                            )
                        except _geo.GeoParseError:
                            return None

                    if n in t.vector_cols or isinstance(r[n], list):
                        vals = r[n] if isinstance(r[n], list) else [r[n]]
                        r[n] = [
                            c for c in (_geo_cast(x) for x in vals)
                            if c is not None
                        ]
                    else:
                        r[n] = _geo_cast(r[n]) or "0x0"
            for n, ty in t.columns:
                if (
                    r.get(n) is not None
                    and n not in t.ref_cols
                    and n not in t.vector_ref_cols
                    and n not in t.weight_vector_cols
                    and n not in geo_cols
                ):
                    r[n] = _cast_load_value(r[n], ty)
            for n, v in r.items():
                if isinstance(v, int) and not -(1 << 63) <= v < (1 << 63):
                    # a UInt64 column genuinely holds [2^63, 2^64): keep
                    # the true value in the row mirror (Python ints are
                    # wide); the Spark frame stores the wrapped two's-
                    # complement (cell() below)
                    if (
                        t.types.get(n) == "UInt64"
                        and 0 <= v < (1 << 64)
                    ):
                        continue
                    raise Unsupported(f"integer beyond Int64 range: {v}")
        if t.sis:
            # KEY_WITH_SIS: inserting a key also registers every proper
            # suffix as a record (suffix_search/…key_with_sis fixtures) —
            # newly created suffix records take the next ids, default
            # column values
            expanded: list[dict] = []
            seen = set(t.keys)
            for r in rows:
                for k in sis_expand([str(r["_key"])]):
                    if k in seen:
                        continue
                    seen.add(k)
                    expanded.append(
                        r if k == str(r["_key"])
                        else {"_key": k, "__sis__": True}
                    )
            rows = expanded
        for r in rows:
            # vector-of-reference elements auto-register too, normalized
            # per the referenced table's key rules
            for col, ref_name in t.vector_ref_cols.items():
                raw = r.get(col)
                if isinstance(raw, str):
                    # casting TEXT into a vector of references TOKENIZES
                    # it with the referenced lexicon's tokenizer
                    # (grn_obj_cast — table_create/default_tokenizer/
                    # delimit/default); plain refs get a 1-element vector
                    reft = self.tables[ref_name]
                    if reft.lex_tokenizer:
                        from .tokenize import tokenize as _tok_cast

                        raw = [
                            tk for tk, _p in _tok_cast(raw, reft.lex_tokenizer)
                        ]
                    else:
                        raw = [raw] if raw else []
                    r[col] = raw
                raw = raw or []
                vals = list(raw) if isinstance(raw, dict) else raw
                ref = self.tables[ref_name]
                if not ref.keyed:
                    continue  # array-table refs are ids — nothing to register
                if ref.key_normalize:
                    vals = [
                        _norm_key(v) if isinstance(v, str) else v for v in vals
                    ]
                    r[col] = (
                        {nk: raw[ok] for nk, ok in zip(vals, raw)}
                        if isinstance(raw, dict) else vals
                    )
                known = {str(x.get("_key", "")) for x in ref.rows}
                for key in vals:
                    if key not in (None, "") and str(key) not in known:
                        self._ingest(
                            ref_name, [{"_key": key, "__auto__": True}]
                        )
                        known.add(str(key))
            # loading an unknown key into a reference column auto-adds it
            # to the referenced table (grn table key auto-registration)
            for col, ref_name in t.ref_cols.items():
                key = r.get(col)
                if key in (None, ""):
                    continue
                ref = self.tables[ref_name]
                if not ref.keyed:
                    continue  # array-table refs are ids — nothing to register
                if ref.key_normalize and isinstance(key, str):
                    key = _norm_key(key)
                if str(key) not in {str(x.get("_key", "")) for x in ref.rows}:
                    # __auto__: dump skips an index-carrying table whose
                    # records are all auto-registered (dump_records,
                    # proc.c:3051 have_index_column && !have_data_column)
                    self._ingest(ref_name, [{"_key": key, "__auto__": True}])
        # indexing auto-registers source values as LEXICON keys: tokens of
        # the lexicon's tokenizer, or the whole (normalized) value for an
        # untokenized index (grn_ii update path —
        # dump/record/table_tokenizer_index_column, delete/reference/*)
        self._index_autoregister(table, rows)
        fresh, accepted, dirty = [], 0, False
        for r in rows:
            is_sis = r.pop("__sis__", False)
            if r.pop("__reject__", False):
                continue  # duplicate-key JSON object (load/array/duplicated_id_key)
            if "_id" in r:
                # explicit _id targets an EXISTING record (array-table
                # update, load/array/id_update); a non-integer or unknown
                # id rejects the row (load/array/invalid_id_value)
                vid = r.pop("_id")
                if isinstance(vid, bool) or not isinstance(vid, int):
                    continue
                tgt = next(
                    (x for x in t.rows + fresh if x.get("_id") == vid), None
                )
                if tgt is None:
                    continue
                tgt.update({k: v for k, v in r.items() if k != "_key"})
                accepted += 1
                dirty = True
                continue
            if t.keyed:
                k = str(r.get("_key", ""))
                if k in t.keys:
                    # keyed upsert: same key updates in place, id unchanged
                    # (the match may sit in THIS batch, not yet committed)
                    tgt = next(
                        x for x in t.rows + fresh
                        if str(x.get("_key", "")) == k
                    )
                    tgt.update({kk: vv for kk, vv in r.items() if kk != "_key"})
                    if not r.get("__auto__"):
                        # an explicit load of an auto-registered key makes
                        # it a real record — it dumps from now on
                        tgt.pop("__auto__", None)
                    if not is_sis:
                        accepted += 1
                    dirty = True
                    continue
                t.keys.append(k)
            r["_id"] = t.next_id
            t.next_id += 1
            fresh.append(r)
            if not is_sis:
                accepted += 1
        t.rows.extend(fresh)
        if dirty:
            t.loaded = True
            self._resync(table)
        elif fresh or not t.loaded:
            # an empty first load still materializes the (empty) frame so
            # later selects can read the table
            df = self._frame(t, fresh)
            self.ctx.load(table, df, key_col="_id")
        t.loaded = True
        return accepted

    def _frame(self, t: _Table, rows: list) -> DataFrame:
        """Build the parquet-shaped frame for ``rows`` of table ``t``
        (reference columns as structs, Groonga defaults for unset cells)."""
        schema_parts = ["_id long"]
        if t.keyed:
            schema_parts.append(f"_key {t.key_type}")
        schema_parts += [f"`{n}` {ty}" for n, ty in t.columns]
        # Groonga default values for unset columns: ""/0/0.0/false/[]
        defaults = {"string": "", "long": 0, "double": 0.0, "boolean": False}
        fill = {"_id": None, "_key": defaults.get(t.key_type, "")}
        for n, ty in t.columns:
            if n in t.ref_cols:
                fill[n] = self._ref_struct(self.tables[t.ref_cols[n]], "")
            else:
                fill[n] = [] if ty.startswith("array") else defaults[ty]

        def cell(r, n):
            v = r.get(n)
            if v is None:
                return fill[n]
            if n in t.ref_cols:
                return self._ref_struct(self.tables[t.ref_cols[n]], v)
            if isinstance(v, dict):
                return list(v)  # weight vector: the frame carries values
            if isinstance(v, int) and v >= (1 << 63):
                return v - (1 << 64)  # UInt64 top half → wrapped long
            return v

        data = [
            tuple(
                cell(r, n)
                for n in ["_id"]
                + (["_key"] if t.keyed else [])
                + [n for n, _ in t.columns]
            )
            for r in rows
        ]
        return self.spark.createDataFrame(data, ", ".join(schema_parts))

    def _resync(self, table: str) -> None:
        """Rewrite a table's parquet frame from the row mirror (after a
        mutation that edits rows in place, e.g. reference clearing)."""
        t = self.tables[table]
        if self.ctx.storage.exists(table):
            self.ctx.truncate(table)
        if t.rows or not self.ctx.storage.exists(table):
            self.ctx.load(table, self._frame(t, t.rows), key_col="_id")

    def _clear_refs(self, rt: str, deleted_keys: set) -> None:
        """Deleting records clears every reference to them: scalar refs
        become the empty key, vector refs drop the element
        (delete/reference/* — grn_obj_delete removes back-references)."""
        for name, t in self.tables.items():
            dirty = False
            for c, ref in t.ref_cols.items():
                if ref != rt:
                    continue
                for r in t.rows:
                    if r.get(c) not in (None, "") and str(r[c]) in deleted_keys:
                        r[c] = ""
                        dirty = True
            for c, ref in t.vector_ref_cols.items():
                if ref != rt:
                    continue
                for r in t.rows:
                    vals = r.get(c) or []
                    if isinstance(vals, dict):  # weight vector
                        nv = {
                            k: w for k, w in vals.items()
                            if str(k) not in deleted_keys
                        }
                    else:
                        nv = [v for v in vals if str(v) not in deleted_keys]
                    if len(nv) != len(vals):
                        r[c] = nv
                        dirty = True
            if dirty:
                self._resync(name)

    # select's positional parameter order (DEF_VAR list, proc.c:6759-6781)
    _SELECT_VARS = (
        "table", "match_columns", "query", "filter", "scorer", "sortby",
        "output_columns", "offset", "limit", "drilldown",
        "drilldown_sortby", "drilldown_output_columns", "drilldown_offset",
        "drilldown_limit", "cache", "match_escalation_threshold",
        "query_expansion", "query_flags", "query_expander", "adjuster",
        "drilldown_calc_types", "drilldown_calc_target",
    )

    def select(self, argv):
        pos, kw = self._kw(argv)
        for i, v in enumerate(pos):
            # bare tokens fill the declared parameter slots in order
            if i < len(self._SELECT_VARS) and self._SELECT_VARS[i] not in kw:
                kw[self._SELECT_VARS[i]] = v
        table = kw.pop("table", None) or pos[0]
        if table not in self.tables:
            raise Unsupported(f"select on unknown table {table}")
        t = self.tables[table]
        lex_index_sort: "tuple[str, bool] | None" = None
        if t.lex_tokenizer is not None:
            # a plain scan over a tokenizer lexicon lists its keys
            # (table_create/default_tokenizer/delimit/default); --sortby
            # ±<index column> orders keys by posting count through grn's
            # partial qsort (select/sort/index); anything else touching
            # index internals (term postings via --query/--filter) stays
            # unsupported
            msb = re.fullmatch(
                r"(-?)([A-Za-z_]\w*)", (kw.get("sortby") or "").strip()
            )
            if (
                msb
                and msb.group(2) in t.index_cols
                and not kw.get("query")
                and not kw.get("filter")
                and not kw.get("match_columns")
            ):
                lex_index_sort = (msb.group(2), bool(msb.group(1)))
                kw["sortby"] = "_id"  # order forced via rank below
            blob = " ".join(str(v) for v in kw.values())
            if (
                kw.get("query") or kw.get("filter")
                or kw.get("match_columns")
                or any(ic in blob for ic in t.index_cols)
            ):
                raise Unsupported("select on a lexicon table")
        if not t.loaded:
            self._ingest(table, [])  # selects on never-loaded tables
        # data columns list ALPHABETICALLY in default output (grn keeps
        # columns in a name-keyed hash — match_columns/no_index/
        # two_columns outputs content before title)
        out_default = ["_id"] + (["_key"] if t.keyed else []) + sorted(
            [n for n, _ in t.columns if n != "_value"]
            + list(t.index_cols)
        )
        query = kw.pop("query", None)
        match_cols = kw.pop("match_columns", None)
        mc_scorer = None
        self._mc_lexicon = None
        if match_cols:
            match_cols, mc_scorer = self._resolve_match_columns(match_cols, t)
        numeric_match = None
        if match_cols:
            plain = [c.split("*")[0].strip() for c in match_cols.split("||")]
            num_types = set(_INT_WIDTH) | {"Float", "Time"}
            if plain and all(t.types.get(c) in num_types for c in plain):
                # match over a numeric index is an exact-value lookup
                # (select/index/match/int*)
                numeric_match = plain
        expander = kw.pop("query_expander", None) or kw.pop(
            "query_expansion", None  # pre-3.x alias (proc.c)
        )
        kw.pop("query_expansion", None)
        if expander is not None and query is not None:
            query = self._expand_query(expander, query, kw.get("query_flags"))
        explicit_sort = kw.pop("sortby", kw.pop("sort_keys", None))
        offset = int(kw.pop("offset", 0))
        limit = int(kw.pop("limit", 10))
        columns: dict[str, str] = {}
        scorer_script = kw.pop("scorer", None)
        if scorer_script:
            # select --scorer: a script statement applied per result
            # record, usually an assignment ('_score = value1 - value2',
            # 'output -= value' — suite/select/filter/arithmetic_operation).
            # Compiled as a dynamic column shadowing the target; a compound
            # op on _score with no fulltext score reads the scan-match
            # score, constant 1 (operator.c res_add).
            m = re.fullmatch(
                r"\s*(_?\w+)\s*(=|[+\-*/%&|^]=|<<=|>>=|>>>=)\s*(.+)",
                scorer_script,
                re.S,
            )
            if not m:
                raise Unsupported(f"scorer {scorer_script!r}")
            tgt, op, rhs = m.groups()
            rhs = rhs.strip()
            # unary inverse of a UInt64 value beyond Int64 max errors the
            # whole select (grn_obj_cast via expr exec — select/filter/
            # arithmetic_operation/unary_minus/uint64_over_int64_max)
            for mneg in re.finditer(r"-\s*([A-Za-z_]\w*)", rhs):
                # unary positions only: start of expression, after an
                # opening paren, or after another operator — `a - b` is
                # binary subtraction, which grn casts without the
                # inverse-sign error
                prev = rhs[: mneg.start()].rstrip()[-1:]
                if prev and prev not in "(=+-*/%&|^<>,!":
                    continue
                cname = mneg.group(1)
                if t.types.get(cname) == "UInt64":
                    for r0 in t.rows:
                        v0 = r0.get(cname)
                        if isinstance(v0, int) and v0 >= (1 << 63):
                            raise QueryParseError(
                                "too large UInt64 value to inverse "
                                f"sign: <{v0}>"
                            )
            if tgt == "_score":
                if query is not None:
                    # would shadow the engine's score column pre-join
                    raise Unsupported("scorer on _score combined with --query")
                base = "1"
                tgt = "score"
            else:
                base = tgt
            expr = rhs if op == "=" else f"({base}) {op[:-1]} ({rhs})"
            # '>>>' operates at the operand's STORED width (Int8 -14 >>> 2
            # = 60, suite/select/filter/arithmetic_operation/shift_rr):
            # mask to the column width before the 64-bit unsigned shift
            masks = {"Int8": 255, "UInt8": 255, "Int16": 65535,
                     "UInt16": 65535, "Int32": 4294967295,
                     "UInt32": 4294967295}
            for cname, gtype in t.types.items():
                if gtype in masks:
                    expr = re.sub(
                        rf"\(?\b{re.escape(cname)}\b\)?\s*>>>",
                        f"({cname} & {masks[gtype]}) >>>",
                        expr,
                    )
            # assignment to an integer column truncates to its type
            # (output /= value on Int8: 7/2 → 3)
            ints = {"Int8": "tinyint", "UInt8": "smallint",
                    "Int16": "smallint", "UInt16": "int",
                    "Int32": "int", "UInt32": "long",
                    "Int64": "long", "UInt64": "long"}
            cast = ints.get(t.types.get(tgt, ""))
            columns[tgt] = {"value": expr, "cast": cast} if cast else expr
        filt = kw.pop("filter", None)
        nested_scores = None  # (key_col, {key: score}) applied post-fetch
        forced_rank = None  # _id → rank forced by an accessor walk
        if lex_index_sort is not None:
            # sort the lexicon by its index column's rendered posting
            # count via grn's exact partial quicksort over the key-trie
            # cursor (select/sort/index: count desc, ties in the
            # pack/part scramble order)
            iname, sdesc = lex_index_sort
            lut = self._index_posting_counts(table, t, iname)
            key_of = (
                (lambda r: str(r.get("_key", "")))
                if (t.pat or t.dat)
                else (lambda r: r["_id"])
            )
            rows_c = sorted(t.rows, key=key_of)
            sign = -1 if sdesc else 1
            # grn_normalize_offset_and_limit before grn_table_sort:
            # negative values wrap against the table size
            n_rows = len(rows_c)
            s_off = offset + n_rows if offset < 0 else offset
            s_lim = n_rows + limit + 1 if limit < 0 else limit
            order = _grn_sort_value(
                [
                    (
                        r["_id"],
                        sign * lut.get(str(r.get("_key", "")), 0),
                    )
                    for r in rows_c
                ],
                max(0, s_off),
                max(0, s_lim),
            )
            forced_rank = {rid: i for i, rid in enumerate(order)}
        if filt and "QueryExpanderTSV" in filt:
            # query("cols", "q", "QueryExpanderTSV") — the TSV plugin
            # (plugins/query_expanders/tsv.c): each query word that is a
            # first-column key expands to the OR of its row's remaining
            # columns, each parsed as a query snippet
            # (select/function/query/query_expander)
            mapping = self._tsv_synonyms()
            if mapping is None:
                raise Unsupported("QueryExpanderTSV without a synonyms file")

            def _rw_tsv(m):
                cols, q = m.group(1), m.group(2)
                expanded = re.sub(
                    r"[\w.-]+",
                    lambda w: (
                        "("
                        + " OR ".join(
                            f"({x})" for x in mapping[w.group(0)]
                        )
                        + ")"
                        if w.group(0) in mapping
                        else w.group(0)
                    ),
                    q,
                )
                return f'query({cols}, "{expanded}")'

            filt = re.sub(
                r'query\(\s*("(?:[^"\\]|\\.)*")\s*,\s*'
                r'"((?:[^"\\]|\\.)*)"\s*,\s*"QueryExpanderTSV"\s*\)',
                _rw_tsv,
                filt,
            )
        # two-hop sub_filter accessor — sub_filter(files.author, "expr"):
        # the expr runs on the FINAL table (Users), matches map back
        # through the scalar reference (Files.author) and then through the
        # outer vector/scalar reference (Packages.files) —
        # select/function/sub_filter/accessor/scalar
        if filt and "sub_filter" in filt:
            m2 = re.search(
                r'sub_filter\(\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*,\s*'
                r'"((?:[^"\\]|\\.)*)"\s*\)',
                filt,
            )
            if m2:
                a, b, inner = m2.groups()
                rt_name = t.vector_ref_cols.get(a) or t.ref_cols.get(a)
                rt = self.tables.get(rt_name or "")
                if rt is not None and b in rt.index_cols:
                    # index-column accessor hop (users.files_author_index):
                    # the expr runs on the index's SOURCE table, matches
                    # map through the indexed column back to rt, then out
                    # through the outer reference; emission order follows
                    # the inner cursor (grn_accessor_resolve walks the
                    # result set in insertion order, db.c:2964-3022)
                    st_name, sc = rt.index_cols[b]
                    fin = self.tables[st_name]
                    if not fin.loaded:
                        self._ingest(st_name, [])
                    inner_expr = inner.replace('\\"', '"')
                    if any(
                        fin.types.get(n) == "Time" for n, _ in fin.columns
                    ):
                        inner_expr = _TIME_LIT_RE.sub(
                            lambda m: repr(_parse_time(m.group(1))),
                            inner_expr,
                        )
                    fres = self.ctx.select(
                        st_name, filter=inner_expr,
                        output_columns="_key", offset=0, limit=-1,
                        id_col="_id",
                    )
                    matched = {
                        str(r["_key"]) for r in fres["records"].collect()
                    }
                    fin_rows = [
                        r for r in fin.rows
                        if str(r.get("_key", "")) in matched
                    ]
                    pm = re.fullmatch(
                        r'\s*_key\s*@\^\s*"(?:[^"\\]|\\.)*"\s*', inner_expr
                    )
                    if pm and fin.pat:
                        # _key @^ runs the pat prefix cursor: DESCENDING
                        # key order (same rule as _natural_rank's _key:^)
                        fin_rows.sort(
                            key=lambda r: str(r.get("_key", "")),
                            reverse=True,
                        )
                    else:
                        fin_rows.sort(key=lambda r: r["_id"])
                    mid_order: list[str] = []
                    for r in fin_rows:
                        v = r.get(sc)
                        for x in v if isinstance(v, list) else [v]:
                            if x not in (None, "") and str(x) not in mid_order:
                                mid_order.append(str(x))
                    keyc = "_key" if t.keyed else "_id"
                    outer_order: list[str] = []
                    for mk in mid_order:
                        for r in sorted(t.rows, key=lambda x: x["_id"]):
                            ov = r.get(a)
                            elems = ov if isinstance(ov, list) else [ov]
                            if mk in [str(x) for x in elems]:
                                k = str(r.get(keyc))
                                if k not in outer_order:
                                    outer_order.append(k)
                    if outer_order:
                        vals = ", ".join(
                            json.dumps(r.get(keyc))
                            for r in t.rows
                            if str(r.get(keyc)) in set(outer_order)
                        )
                        cond = f"in_values({keyc}, {vals})"
                        pos = {k: i for i, k in enumerate(outer_order)}
                        forced_rank = {
                            r["_id"]: pos[str(r.get(keyc))]
                            for r in t.rows
                            if str(r.get(keyc)) in pos
                        }
                    else:
                        cond = "1 == 2"
                    filt = filt[: m2.start()] + cond + filt[m2.end():]
                    m2 = None
                if m2 is not None and rt is not None and (
                    b in rt.ref_cols or b in rt.vector_ref_cols
                ):
                    fin_name = rt.ref_cols.get(b) or rt.vector_ref_cols[b]
                    fin = self.tables[fin_name]
                    if not fin.loaded:
                        self._ingest(fin_name, [])
                    inner_expr = inner.replace('\\"', '"')
                    qm = re.fullmatch(
                        r'\s*query\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*'
                        r'"((?:[^"\\]|\\.)*)"\s*\)\s*',
                        inner_expr,
                    )
                    if qm:
                        # nested query(): run the final table's own select
                        # (index-named weighted match columns resolve
                        # there), scores ride back through the references
                        # (select/function/query/nested_index: 20·tf+5·tf)
                        res = self.select([
                            "select", fin_name,
                            "--match_columns", qm.group(1),
                            "--query", qm.group(2),
                            "--output_columns", "_key,_score",
                            "--limit", "-1",
                        ])
                        matched_map = {
                            str(r[0]): float(r[1]) for r in res[0][2]
                        }
                    else:
                        if any(
                            fin.types.get(n) == "Time"
                            for n, _ in fin.columns
                        ):
                            inner_expr = _TIME_LIT_RE.sub(
                                lambda m: repr(_parse_time(m.group(1))),
                                inner_expr,
                            )
                        fres = self.ctx.select(
                            fin_name, filter=inner_expr,
                            output_columns="_key", offset=0, limit=-1,
                            id_col="_id",
                        )
                        matched_map = {
                            str(r["_key"]): 1.0
                            for r in fres["records"].collect()
                        }
                    mid_score: dict[str, float] = {}
                    for r in rt.rows:
                        mv = r.get(b)
                        elems = mv if isinstance(mv, list) else [mv]
                        s = sum(
                            matched_map.get(str(x), 0.0) for x in elems
                        )
                        if s:
                            mid_score[str(r.get("_key", ""))] = s
                    keyc = "_key" if t.keyed else "_id"
                    outer_score: dict[str, float] = {}
                    for r in t.rows:
                        ov = r.get(a)
                        elems = ov if isinstance(ov, list) else [ov]
                        s = sum(mid_score.get(str(x), 0.0) for x in elems)
                        if s:
                            outer_score[str(r.get(keyc))] = s
                    if outer_score:
                        vals = ", ".join(
                            json.dumps(r.get(keyc))
                            for r in t.rows
                            if str(r.get(keyc)) in outer_score
                        )
                        cond = f"in_values({keyc}, {vals})"
                    else:
                        cond = "1 == 2"
                    filt = filt[: m2.start()] + cond + filt[m2.end():]
                    if qm and nested_scores is None:
                        nested_scores = (keyc, outer_score)
        # nested index match: ref_col.sub_col runs the match on the
        # REFERENCED table, then maps hits back through the reference —
        # score rides along × the match weight (select/index/nested/*)
        # weight vector match: a --query term over a WITH_WEIGHT vector
        # column scores (stored weight + 1) × match-column weight per
        # matching element (select/match_columns/weight/weight_vector,
        # select/query/weight_vector)
        if query is not None and match_cols and "||" not in match_cols:
            p = match_cols.strip()
            w = 1.0
            wm = re.fullmatch(r"(.+?)\s*\*\s*(\d+(?:\.\d+)?)", p)
            if wm:
                p, w = wm.group(1).strip(), float(wm.group(2))
            if p in t.weight_vector_cols:
                term = query.strip()
                if not re.fullmatch(r"[\w.-]+", term):
                    raise Unsupported("complex query over a weight vector")
                rt = t.vector_ref_cols.get(p)
                normf = (
                    _norm_key
                    if rt and self.tables[rt].key_normalize
                    else (lambda s: s)
                )
                qn = normf(term)
                keycol = "_key" if t.keyed else "_id"
                matched = {}
                for r in t.rows:
                    s = sum(
                        wt + 1
                        for k, wt in (r.get(p) or {}).items()
                        if normf(str(k)) == qn
                    )
                    if s:
                        matched[str(r.get(keycol))] = float(s) * w
                if not matched:
                    cond = "1 == 2"
                elif keycol == "_key":
                    vals = ", ".join(json.dumps(k) for k in matched)
                    cond = f"in_values(_key, {vals})"
                else:
                    cond = f"in_values(_id, {', '.join(matched)})"
                filt = f"({filt}) && ({cond})" if filt else cond
                nested_scores = (keycol, matched)
                query, match_cols = None, None
        if query is not None and match_cols and "." in match_cols:
            p = match_cols.split("||")[0].strip()
            w = 1.0
            wm = re.fullmatch(r"(.+?)\s*\*\s*(\d+(?:\.\d+)?)", p)
            if wm:
                p, w = wm.group(1).strip(), float(wm.group(2))
            segs = p.split(".")
            base = segs[0]
            if (
                "||" not in match_cols
                and len(segs) == 2
                and (base in t.ref_cols or base in t.vector_ref_cols)
            ):
                rt = t.ref_cols.get(base) or t.vector_ref_cols[base]
                ft = self.tables[rt]
                if not ft.loaded:
                    self._ingest(rt, [])
                if segs[1] in ft.weight_vector_cols:
                    # nested weight vector (products.tags * 10): each
                    # referenced record scores (weight+1) × w; the outer
                    # record sums its elements' scores
                    # (select/match_columns/weight/nested_weight_vector)
                    term = query.strip()
                    if not re.fullmatch(r"[\w.-]+", term):
                        raise Unsupported("complex query over a weight vector")
                    nrt = ft.vector_ref_cols.get(segs[1])
                    normf = (
                        _norm_key
                        if nrt and self.tables[nrt].key_normalize
                        else (lambda s: s)
                    )
                    qn = normf(term)
                    matched = {}
                    for r in ft.rows:
                        s = sum(
                            wt + 1
                            for k, wt in (r.get(segs[1]) or {}).items()
                            if normf(str(k)) == qn
                        )
                        if s:
                            matched[str(r.get("_key", ""))] = float(s) * w
                else:
                    fres = self.ctx.select(
                        rt,
                        query=query,
                        match_columns=segs[1],
                        output_columns="_key,_score",
                        sortby="_id",
                        offset=0,
                        limit=-1,
                        id_col="_id",
                        scorer=mc_scorer or "tf",
                        text_cols=[segs[1]],
                        tokenizer=ft.tokenizer or "bigram",
                    )
                    matched = {
                        r["_key"]: r["score"] * w
                        for r in fres["records"].collect()
                    }
                if not matched:
                    cond = "1 == 2"
                elif base in t.ref_cols:
                    vals = ", ".join(json.dumps(k) for k in matched)
                    cond = f"in_values({base}._key, {vals})"
                else:
                    cond = f'sub_filter({base}, "in_values(_key, ' + ", ".join(
                        json.dumps(k).replace('"', '\\"') for k in matched
                    ) + ')")'
                filt = f"({filt}) && ({cond})" if filt else cond
                nested_scores = (base, {str(k): v for k, v in matched.items()})
                query, match_cols = None, None
        if numeric_match is not None and query is not None:
            # exact-value lookup instead of fulltext matching
            if not re.fullmatch(r"-?\d+(\.\d+)?", query.strip()):
                raise QueryParseError(f"non-numeric match query {query!r}")
            cond = " || ".join(f"{c} == {query.strip()}" for c in numeric_match)
            filt = f"({filt}) && ({cond})" if filt else cond
            query, match_cols = None, None
        args: dict = dict(
            query=query,
            filter=filt,
            match_columns=match_cols,
            output_columns=kw.pop("output_columns", ",".join(out_default)),
            # ties under an explicit -_score sort come out id-DESCENDING
            # (grn partial sort reverses scan order on equal keys —
            # match_columns/scorer/tf_at_most/max/*)
            sortby=(
                "-_score,-_id" if explicit_sort in ("-_score", "- _score")
                else explicit_sort or "_id"
            ),
            offset=offset,
            limit=limit,
            id_col="_id",
            scorer=mc_scorer or "tf",
            columns=columns or None,
        )
        # _key ops always scan: the reference resolves _key:^ / _key:$ via
        # the key trie (key prefix/suffix search), never the fulltext
        # lexicon — our endswith/startswith scan reproduces those results
        key_scan = ["_key"] if t.keyed and t.key_type == "string" else []
        _geo_domain = {"WGS84GeoPoint": "wgs84", "TokyoGeoPoint": "tokyo"}
        geo_cols = {
            n: _geo_domain[g]
            for n, g in t.types.items()
            if g in _geo_domain
        }
        if t.keyed and t.key_gtype in _geo_domain:
            geo_cols["_key"] = _geo_domain[t.key_gtype]
        if geo_cols:
            args["geo_cols"] = geo_cols
        geo_rank: "dict[int, int] | None" = None
        bare_geo = _bare_geo_call(filt) if filt and geo_cols else None
        if bare_geo is not None and bare_geo[1] and (
            bare_geo[1][0].strip() in geo_cols
        ):
            from . import geo as _geo

            kind, gargs = bare_geo
            gcol = gargs[0].strip()
            # geo selectors are index-only — no sequential fallback in the
            # reference (grn_geo_select_*, lib/geo.c:793,1246); the geo
            # "index" is either a COLUMN_INDEX in a geo-keyed PAT lexicon
            # or the geo-keyed PAT trie itself for _key
            indexed = t.pat if gcol == "_key" else gcol in t.indexed_cols
            if not indexed:
                raise ScriptSyntaxError(
                    f"geo_in_{kind}(): index for <{table}.{gcol}> is missing"
                )

            def _glit(a: str):
                a = a.strip()
                if len(a) >= 2 and a[0] in "\"'" and a[-1] == a[0]:
                    try:
                        return _geo.parse_geopoint(a[1:-1])
                    except _geo.GeoParseError:
                        return None
                return None

            if kind == "rectangle" and len(gargs) == 3:
                tl, br = _glit(gargs[1]), _glit(gargs[2])
                if tl is not None and br is not None:
                    # the index path validates corner bounds before the
                    # mesh walk (in_rectangle_data_validate,
                    # lib/geo.c:1085-1177)
                    try:
                        _geo.validate_rectangle(tl, br, "geo_in_rectangle()")
                    except _geo.GeoParseError as e:
                        raise ScriptSyntaxError(str(e)) from None
            if (
                kind == "circle"
                and not explicit_sort
                and query is None
                and 3 <= len(gargs) <= 4
            ):
                center = _glit(gargs[1])
                rad_s = gargs[2].strip()
                radius = _glit(gargs[2])
                if radius is None:
                    try:
                        radius = float(rad_s)
                    except ValueError:
                        radius = None
                approx = "rectangle"
                if len(gargs) == 4:
                    approx = _geo.APPROX_NAMES.get(
                        gargs[3].strip().strip("\"'"), "rectangle"
                    )
                if center is not None and radius is not None:
                    pts = []
                    for r in t.rows:
                        v = r.get("_key") if gcol == "_key" else r.get(gcol)
                        if isinstance(v, str):
                            try:
                                pts.append(
                                    (r["_id"], _geo.parse_geopoint(v))
                                )
                            except _geo.GeoParseError:
                                pass
                    order = _geo.in_circle_select_order(
                        pts, center, radius, approx, geo_cols[gcol]
                    )
                    geo_rank = {rid: i for i, rid in enumerate(order)}
        if t.vector_cols:
            # vector (tag) columns: match ops evaluate per element; an
            # index over the vector makes `@` an exact element lookup
            args["array_match"] = {
                n: n in t.indexed_cols for n in t.vector_cols
            }
        scalar_indexed = [
            c for c in t.indexed_cols
            if c not in t.vector_cols and c not in t.ref_cols
        ]
        ref_query_cols: list[str] = []
        if query is not None and t.indexed_cols and not scalar_indexed:
            # only ref/vector indexes exist: a colop-only query still
            # evaluates (the reference resolves `tag:...` through the
            # reference column's value; our scan path reads the stored
            # struct's _key as text) — anything needing a fulltext match
            # stays unsupported
            from .query.parser import (
                And as _QAnd,
                ColumnOp as _QCol,
                Not as _QNot,
                Or as _QOr,
                Term as _QTerm,
                parse_query_ex as _pq,
            )

            def _colop_only(n) -> bool:
                if isinstance(n, _QCol):
                    return True
                if isinstance(n, (_QAnd, _QOr)):
                    return all(_colop_only(c) for c in n.children)
                if isinstance(n, _QNot):
                    return _colop_only(n.positive) and _colop_only(n.negative)
                return False

            try:
                _qa, _pr = _pq(query, flags=kw.get("query_flags"))
            except QueryParseError:
                _qa = None
            mc_list = [
                x.split("*")[0].strip()
                for x in (match_cols or "").split("||")
                if x.strip()
            ]
            if (
                isinstance(_qa, _QTerm)
                and mc_list
                and all(c in t.vector_ref_cols for c in mc_list)
            ):
                # bare term matched through a vector-reference index whose
                # lexicon has no tokenizer: GET = exact key lookup, then
                # match escalation re-runs as PREFIX over the key trie
                # (grn_ii_sel — table_create/default_tokenizer/
                # nonexistent: "Samurai" prefix-hits the whole-string key
                # "Samurai Japanese Japan"); hits = rows whose vector
                # holds a matched key
                hit_ids: set = set()
                for c in mc_list:
                    ref = self.tables[t.vector_ref_cols[c]]
                    fnorm = (
                        _norm_key
                        if ref.key_normalize or ref.normalizer_raw
                        else (lambda s: s)
                    )
                    qn = fnorm(query.strip())
                    keys = [str(k) for k in ref.keys]
                    matched = {k for k in keys if fnorm(k) == qn} or {
                        k for k in keys if fnorm(k).startswith(qn)
                    }
                    for r in t.rows:
                        vals = r.get(c) or []
                        if any(str(v) in matched for v in vals):
                            hit_ids.add(r["_id"])
                args["query"], args["match_columns"] = None, None
                cond = (
                    " || ".join(f"_id == {i}" for i in sorted(hit_ids))
                    or "1 == 2"
                )
                # grn ANDs --query matches with --filter
                prev_f = args.get("filter")
                args["filter"] = (
                    f"({prev_f}) && ({cond})" if prev_f else cond
                )
            elif _qa is None or not _colop_only(_qa):
                raise Unsupported("--query over a vector index")
            ref_query_cols = [
                c
                for c in {m.group(1) for m in re.finditer(r"([A-Za-z_]\w*):", query)}
                if c in t.ref_cols
            ]
            if ref_query_cols:
                cols = dict(args.get("columns") or {})
                for c in ref_query_cols:
                    cols[c] = f"{c}._key"
                args["columns"] = cols
        if (
            query is not None
            and args.get("query") is not None
            and not scalar_indexed
            and match_cols
            and "||" in match_cols
        ):
            # an unindexed MULTI-column match matches nothing (sequential
            # scan handles one column only — match_columns/no_index/
            # two_columns expects zero hits)
            args["query"], args["match_columns"] = None, None
            args["filter"] = "1 == 2"
        nested_mc: dict[str, str] = {}
        if query is not None and match_cols:
            # scalar references are stored as structs, so a nested match
            # column (owner.name) is a readable string field: flatten it
            # into a dynamic column and build the throwaway match index
            # over it alongside the plain columns
            # (nested/match_columns/*, by_column/with_top_level_index)
            for p in (x.split("*")[0].strip() for x in match_cols.split("||")):
                if "." in p and p.split(".")[0] in t.ref_cols:
                    nested_mc[p] = f"__nm{len(nested_mc)}"
            if nested_mc:
                for p, safe in nested_mc.items():
                    match_cols = match_cols.replace(p, safe)
                args["match_columns"] = match_cols
                cols = dict(args.get("columns") or {})
                cols.update({safe: p for p, safe in nested_mc.items()})
                args["columns"] = cols
        if scalar_indexed:
            args["text_cols"] = scalar_indexed + list(nested_mc.values())
            args["tokenizer"] = (
                self._lex_engine_tokenizer(self._mc_lexicon)
                if getattr(self, "_mc_lexicon", None) is not None
                else t.tokenizer
            )
            args["scan_columns"] = key_scan
            # the indexing lexicon's --token_filters ride into the engine:
            # TokenFilterStem stems at ADD+GET, TokenFilterStopWord drops
            # query tokens whose lexicon record has is_stop_word
            # (token_filters/stem/*, token_filters/stop_word/*)
            tf, stops = set(), set()
            for lx, _n, _f, src, _s in self.index_defs:
                lex = self.tables.get(lx)
                if src != table or lex is None:
                    continue
                if "TokenFilterStem" in lex.token_filters:
                    tf.add("stem")
                if "TokenFilterStopWord" in lex.token_filters:
                    tf.add("stopword")
                    stops |= {
                        str(r.get("_key", ""))
                        for r in lex.rows
                        if r.get("is_stop_word")
                    }
            if tf:
                args["token_filters"] = tuple(sorted(tf))
                args["stopwords"] = frozenset(stops)
        elif nested_mc:
            strings = [n for n, ty in t.columns if ty == "string"]
            args["text_cols"] = strings + list(nested_mc.values())
            args["tokenizer"] = "bigram"
            args["scan_columns"] = key_scan
        else:
            # no COLUMN_INDEX anywhere → every query-syntax column op
            # scans, as the reference does without an index
            strings = [n for n, ty in t.columns if ty == "string"]
            args["text_cols"] = strings or key_scan
            args["tokenizer"] = "bigram"
            args["scan_columns"] = strings + key_scan + ref_query_cols
        # *N/*S in --filter must error on columns with no index (they are
        # index-only searches); scan_columns can't serve as that guard —
        # _key rides there for trie colop semantics even when indexed
        args["noindex_cols"] = [
            n for n, _ in t.columns if n not in t.indexed_cols
        ] + (
            ["_key"] if t.keyed and "_key" not in t.indexed_cols else []
        )
        # drilldown parameters: plain (--drilldown keys + shared
        # drilldown_* params) and labeled (--drilldown[label].param)
        dd_plain = kw.pop("drilldown", None)
        dd_shared = {
            p: kw.pop(f"drilldown_{p}")
            for p in ("output_columns", "sortby", "offset", "limit",
                      "calc_types", "calc_target")
            if f"drilldown_{p}" in kw
        }
        dd_labeled: dict[str, dict] = {}
        for k in list(kw):
            m = re.fullmatch(r"drilldowns?\[(\w+)\]\.(\w+)", k)
            if m:
                dd_labeled.setdefault(m.group(1), {})[m.group(2)] = kw.pop(k)
        if "query_flags" in kw:
            args["query_flags"] = kw.pop("query_flags")
        if "match_escalation_threshold" in kw:
            args["match_escalation_threshold"] = int(
                kw.pop("match_escalation_threshold")
            )
        kw.pop("cache", None)
        # --adjuster 'col @ "value" * factor + …' (grn_select adjuster,
        # proc.c): each matching element ADDS (stored weight + 1) × factor
        # to the record's score; non-matching records keep their base
        # score (select/adjuster/*).  '+' inside quoted values is not
        # split (no suite fixture carries one).
        adjust = None
        adj_spec = kw.pop("adjuster", None)
        if adj_spec:
            adjust = []
            for part in (x.strip() for x in adj_spec.split("+")):
                m = re.fullmatch(
                    r'(\w+)\s*@\s*"((?:[^"\\]|\\.)*)"'
                    r"\s*(?:\*\s*(\d+(?:\.\d+)?))?",
                    part,
                )
                if not m or m.group(1) not in t.types:
                    raise QueryParseError(f"invalid adjuster {adj_spec!r}")
                adjust.append(
                    (m.group(1), m.group(2), float(m.group(3) or 1))
                )
        out_type = kw.pop("output_type", "json")
        if out_type not in ("json", "xml"):
            raise Unsupported(f"output_type {out_type}")
        kw.pop("callback", None)  # jsonp wrapper — verified in run_fixture
        if kw.pop("command_version", "1") not in ("1", "2"):
            raise Unsupported("command_version 3 (object output)")
        if kw:
            raise Unsupported(f"select args {sorted(kw)}")
        if args["filter"] and _SELECTOR_CALL.search(args["filter"]):
            # register reference metadata for sub_filter()/query():
            # forward refs join on the stored struct's _key; index columns
            # reverse-join the source records onto our _key
            for c, rt in t.ref_cols.items():
                if not self.tables[rt].loaded:
                    self._ingest(rt, [])
                self.ctx.set_reference(table, c, rt, "_key", local=f"{c}._key")
                self.ctx.set_reference(
                    table, f"{c}._key", rt, "_key", local=f"{c}._key"
                )
            for iname, (st, sc) in t.index_cols.items():
                if not self.tables[st].loaded:
                    self._ingest(st, [])
                fk = f"{sc}._key" if sc in self.tables[st].ref_cols else sc
                self.ctx.set_reference(table, iname, st, fk, local="_key")
            for c, rt in t.vector_ref_cols.items():
                if not self.tables[rt].loaded:
                    self._ingest(rt, [])
                self.ctx.set_reference(table, c, rt, "_key", array=True)
        if args["filter"]:
            f = args["filter"]
            if t.keyed and t.key_normalize and t.key_type == "string":
                # the key trie stores NORMALIZED keys — a _key comparison
                # literal normalizes before the lookup
                # (load/utf8_4byte/normalize: _key == "A" finds "a")
                f = re.sub(
                    r'\b_key\s*(==|!=)\s*"((?:[^"\\]|\\.)*)"',
                    lambda m: f'_key {m.group(1)} '
                    + json.dumps(_norm_key(m.group(2))),
                    f,
                )
            if any(t.types.get(n) == "Time" for n, _ in t.columns) or any(
                "Time" in self.tables[rt].types.values()
                for rt in t.ref_cols.values()
                if rt in self.tables
            ):
                # Time comparisons coerce datetime string literals
                # (suite/select/filter/no_index/time/*) — grntest runs in
                # JST, see _parse_time
                f = _TIME_LIT_RE.sub(lambda m: repr(_parse_time(m.group(1))), f)
            for col in t.ref_cols:
                # a reference column used as a VALUE (not dotted) means
                # its key text (match/prefix ops on reference columns)
                f = re.sub(rf"\b{re.escape(col)}\b(?!\s*\.)", f"{col}._key", f)
            args["filter"] = f
            # table-record literals (Keywords["groonga"].label —
            # filter/record/key/*): resolve sibling tables by name, never
            # shadowing a column of the selected table
            cur_cols = set(t.types) | {"_id", "_key"}

            def _resolver(name, _cur=cur_cols):
                if name in _cur:
                    return None
                rt = self.tables.get(name)
                if rt is None or not rt.keyed or rt.lex_tokenizer is not None:
                    return None
                if not rt.loaded:
                    self._ingest(name, [])
                return (self.ctx._read(name), "_key", bool(rt.key_normalize))

            args["table_resolver"] = _resolver

        if not explicit_sort and query is None and args.get("filter"):
            # an index-accelerated RANGE filter outputs in index-cursor
            # order — ascending column value (select/index/range/*/time:
            # the pat/dat lexicon cursor walks keys in order); ties keep
            # posting (id) order
            m = re.fullmatch(
                r'\s*([A-Za-z_][\w.]*)\s*(?:>=|<=|>|<)\s*'
                r'("(?:[^"\\]|\\.)*"|-?[\d.]+)\s*',
                args["filter"],
            )
            if m and m.group(1) in t.indexed_cols:
                lex = next(
                    (
                        self.tables[lx]
                        for lx, _n, _f, src, srcs in self.index_defs
                        if src == table and m.group(1) in srcs.split(",")
                        and lx in self.tables
                    ),
                    None,
                )
                if lex is not None and (lex.pat or lex.dat):
                    args["sortby"] = f"{m.group(1)},_id"
        rank = geo_rank if geo_rank is not None else forced_rank
        if rank is None and not explicit_sort:
            rank = self._natural_rank(t, args)
        if rank is None and not explicit_sort and query is not None:
            rank = self._or_branch_rank(table, t, args)
        entries = _split_output_columns(args["output_columns"])
        if "*" in entries:
            # '*' expands to the DATA columns sorted by name (no pseudo
            # columns — output_columns/star/*)
            star = sorted(n for n, _ in t.columns)
            i = entries.index("*")
            entries = entries[:i] + star + entries[i + 1 :]
        ident = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
        # a lexicon's INDEX column outputs its per-key posting count
        # (delete/index/fix_size_column: users_age is 1, then 0 after the
        # referencing record deletes)
        idx_counts = {
            e: self._index_posting_counts(table, t, e)
            for e in t.index_cols
        }
        known = set(t.types) | {"_id", "_score", "_nsubrecs"} | set(idx_counts)
        if t.keyed:
            known.add("_key")  # _key on a NO_KEY table silently drops
            # (index/nested/by_key/match outputs only 'path')
        # nonexistent output columns are silently DROPPED by the reference
        # (output_columns/nonexistent/*, key/chained_not_exist)
        dotted = re.compile(r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)")
        dotted3 = re.compile(r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)\.([A-Za-z_]\w*)")
        kept = []
        vec_ref: dict[str, tuple[str, str, dict]] = {}
        for e in entries:
            if ident.fullmatch(e):
                if e in known:
                    kept.append(e)
                continue
            m3 = dotted3.fullmatch(e)
            if m3 and m3.group(1) in t.vector_ref_cols:
                # two-hop vector output (files.author.birthday): per
                # element, the scalar reference's attribute
                # (sub_filter/accessor/scalar output_columns)
                ref = self.tables[t.vector_ref_cols[m3.group(1)]]
                mid, attr = m3.group(2), m3.group(3)
                fin_name = ref.ref_cols.get(mid) or ref.vector_ref_cols.get(
                    mid
                )
                if fin_name and (
                    attr == "_key" or attr in self.tables[fin_name].types
                ):
                    fin = self.tables[fin_name]
                    dfl = {"string": "", "long": 0, "double": 0.0,
                           "boolean": False}
                    fdef = dfl.get(dict(fin.columns).get(attr, "string"), "")
                    fin_lut = {
                        str(r.get("_key", "")): (
                            r.get("_key") if attr == "_key"
                            else r.get(attr, fdef)
                        )
                        for r in fin.rows
                    }
                    if mid in ref.vector_ref_cols:
                        # vector mid-hop (blogs.entries.content): each
                        # element maps to the LIST of its sub-elements'
                        # values (select/function/query/nested_index)
                        lut = {
                            str(r.get("_key", "")): [
                                fin_lut.get(str(x), fdef)
                                for x in (r.get(mid) or [])
                            ]
                            for r in ref.rows
                        }
                    else:
                        lut = {
                            str(r.get("_key", "")): fin_lut.get(
                                str(r.get(mid, ""))
                            )
                            for r in ref.rows
                        }
                    vec_ref[e] = (m3.group(1), attr, lut)
                    kept.append(e)
                continue
            m = dotted.fullmatch(e)
            if m:
                base, attr = m.groups()
                if base not in known:
                    continue
                if base in t.vector_ref_cols:
                    # vector-of-references path: per-element lookup into
                    # the referenced table's mirror
                    ref = self.tables[t.vector_ref_cols[base]]
                    if attr != "_key" and attr not in ref.types:
                        continue
                    dflt = {"string": "", "long": 0, "double": 0.0,
                            "boolean": False}
                    d = dflt.get(dict(ref.columns).get(attr, "string"), "")
                    lut = {
                        str(r.get("_key", "")): r.get(attr, d) if attr != "_key"
                        else r.get("_key")
                        for r in ref.rows
                    }
                    vec_ref[e] = (base, attr, lut)
                    kept.append(e)
                    continue
                if base in t.ref_cols:
                    ref = self.tables[t.ref_cols[base]]
                    if attr != "_key" and attr not in ref.types:
                        continue
                elif base in t.types or base in ("_id", "_key", "_score"):
                    continue  # scalar has no sub-path (_key.garbage)
            kept.append(e)
        entries = kept
        exprs: dict[str, _OutExpr] = {}
        fetch: list[str] = []
        for e in entries:
            if ident.fullmatch(e):
                if e in idx_counts:
                    continue  # runner-side posting count, not a frame col
                if e not in fetch:
                    fetch.append(e)
            elif e in vec_ref:
                if vec_ref[e][0] not in fetch:
                    fetch.append(vec_ref[e][0])
            else:
                x = _OutExpr(e, t.types)
                exprs[e] = x
                for c in x.cols:
                    if c not in fetch:
                        fetch.append(c)
        weighted_out = [e for e in entries if e in t.weight_vector_cols]
        if "_id" not in fetch and (
            rank is not None or adjust is not None or weighted_out
            or not fetch
        ):
            fetch.append("_id")
        if (
            t.keyed
            and "_key" not in fetch
            and any(e in idx_counts for e in entries)
        ):
            fetch.append("_key")
        if nested_scores is not None and nested_scores[0] not in fetch:
            fetch.append(nested_scores[0])
        dd_specs: list[tuple[str | None, list[str], dict]] = []
        if dd_plain:
            for key in (k.strip() for k in dd_plain.split(",")):
                if key:
                    dd_specs.append((None, [key], dd_shared))
        for label, spec in dd_labeled.items():
            keys = [k.strip() for k in spec.get("keys", "").split(",") if k.strip()]
            dd_specs.append((label, keys, spec))
        for _lbl, keys, spec in dd_specs:
            for k in keys + (
                [spec["calc_target"]] if spec.get("calc_target") else []
            ):
                if k not in fetch and k in t.types:
                    fetch.append(k)
        if exprs:
            kws = self._query_keywords(args)
            for x in exprs.values():
                x.fctx = {"keywords": kws}
        args["output_columns"] = ",".join(fetch)
        full_fetch = rank is not None or bool(dd_specs)
        if full_fetch:
            # storage-order output (pat/dat cursor order, SIS walk order)
            # and drilldowns need the FULL match set — fetch all, page
            # here.  Matching stays entirely engine-side; only ordering /
            # grouping presentation happens in the runner.
            args["offset"], args["limit"] = 0, -1
        res = self.ctx.select(table, **args)
        rows = res["records"].collect()
        n_hits = res["n_hits"]
        if nested_scores is not None:
            # _score = sum of the matched referenced records' scores
            base, matched = nested_scores
            patched = []
            for r in rows:
                d = r.asDict()
                v = d.get(base)
                if isinstance(v, list):
                    d["score"] = sum(matched.get(str(k), 0.0) for k in v)
                elif v is None or isinstance(v, (str, int, float)):
                    # direct record scores keyed on _key/_id
                    # (weight vector match)
                    d["score"] = matched.get(str(v), 0.0)
                else:
                    d["score"] = matched.get(str(v["_key"]), 0.0)
                patched.append(d)
            rows = patched
        if adjust is not None:
            adj_by_id: dict = {}
            for r in t.rows:
                a = 0.0
                for col, val, factor in adjust:
                    cell = r.get(col)
                    if isinstance(cell, dict):  # weight vector
                        a += sum(
                            (wt + 1) * factor
                            for k, wt in cell.items()
                            if str(k) == val
                        )
                    elif isinstance(cell, list):  # plain vector: weight 0
                        a += sum(factor for k in cell if str(k) == val)
                    elif cell is not None and str(cell) == val:
                        a += factor
                if a:
                    adj_by_id[r["_id"]] = a
            patched = []
            for r in rows:
                d = r.asDict() if hasattr(r, "asDict") else dict(r)
                d["score"] = d.get("score", 0.0) + adj_by_id.get(
                    d.get("_id"), 0.0
                )
                patched.append(d)
            rows = patched
        if rank is not None:
            rows = sorted(rows, key=lambda r: rank.get(r["_id"], 1 << 60))
        full_rows = rows  # pre-paging: drilldowns group the whole set
        if full_fetch:
            off = offset if offset >= 0 else max(n_hits + offset, 0)
            lim = limit if limit >= 0 else max(n_hits + limit + 1 - off, 0)
            rows = rows[off : off + lim]
        wv_lut = (
            {r["_id"]: r for r in t.rows} if weighted_out else {}
        )
        page = []
        for row in rows:
            vals = []
            for e in entries:
                if e in exprs:
                    d = row.asDict() if hasattr(row, "asDict") else dict(row)
                    if "score" in d:
                        d["_score"] = d["score"]
                    vals.append(self._out_val(exprs[e].eval(d)))
                elif e in vec_ref:
                    base, _attr, lut = vec_ref[e]
                    vals.append([lut.get(str(k)) for k in (row[base] or [])])
                elif e in weighted_out:
                    # weight vector output renders the stored {value:
                    # weight} object (select/output/value/weight_vector/*)
                    src = wv_lut.get(row["_id"], {})
                    v = src.get(e) or {}
                    vals.append(
                        v if isinstance(v, dict) else {str(k): 0 for k in v}
                    )
                elif e in idx_counts:
                    vals.append(idx_counts[e].get(str(row["_key"]), 0))
                else:
                    v = row[self._col_name(e)]
                    if e == "_score" and isinstance(v, float):
                        v = int(v)  # _score is Int32 in the reference
                    vals.append(self._out_val(v))
            page.append(vals)
        cols_out = [exprs[e].name if e in exprs else e for e in entries]
        out_tables: list = [(n_hits, cols_out, page)]
        labeled_out: dict = {}
        for label, keys, spec in dd_specs:
            if not keys:
                continue  # empty .keys → label dropped, {} marker stays
            tbl = self._run_drilldown(t, full_rows, keys, spec)
            if label is None:
                out_tables.append(tbl)
            else:
                labeled_out[label] = tbl
        if dd_labeled:
            out_tables.append(labeled_out)
        if out_type == "xml":
            if dd_specs:
                raise Unsupported("xml select with drilldowns")
            return _Resp(
                self._xml_resultset(n_hits, cols_out, page, max(offset, 0))
            )
        return out_tables

    def _run_drilldown(self, t: _Table, rows, keys: list, spec: dict):
        """One drilldown result table from the FULL matched rows: groups
        in FIRST-OCCURRENCE order (grn's result hash insertion —
        drilldown/plain/single), python-side aggregation over the
        engine-matched set.  Output forms: _key, _key[i], _value.col
        (._key), _nsubrecs, _sum/_max/_min/_avg."""
        for k in keys:
            if t.types.get(k) in ("Text", "LongText"):
                # the reference refuses drilldown on a Text-typed key
                # (plain/invalid/too_large_type → rc<0)
                raise ScriptSyntaxError(f"drilldown key too large: {k}")

        def kv(r, k):
            v = r[k]
            return v["_key"] if hasattr(v, "__fields__") else v

        order: list[tuple] = []
        groups: dict[tuple, dict] = {}

        def add(g, r):
            st = groups.get(g)
            if st is None:
                st = groups[g] = {"n": 0, "vals": []}
                order.append(g)
            st["n"] += 1
            tgt = spec.get("calc_target")
            if tgt:
                st["vals"].append(r[tgt])

        import itertools

        for r in rows:
            # vector keys fan out per element (labeled/keys/vector:
            # user,tags,date groups one combo per tag element)
            axes = []
            for k in keys:
                if k in t.vector_cols:
                    axes.append(list(r[k] or []))
                else:
                    axes.append([kv(r, k)])
            for g in itertools.product(*axes):
                add(g, r)
        calcs = [
            c.strip().lower()
            for c in (spec.get("calc_types") or "").split(",")
            if c.strip() and c.strip().upper() != "NONE"
        ]

        def agg(st, fn):
            vals = [v for v in st["vals"] if v is not None]
            if not vals:
                return 0
            if fn == "sum":
                return sum(vals)
            if fn == "max":
                return max(vals)
            if fn == "min":
                return min(vals)
            return sum(vals) / len(vals)  # avg → Float

        def cell(g, e):
            st = groups[g]
            if e == "_key":
                return g[0]
            if e == "_id":  # group id = 1-based insertion order
                return order.index(g) + 1
            if e == "_nsubrecs":
                return st["n"]
            m = re.fullmatch(r"_key\[(\d+)\]", e)
            if m:
                return g[int(m.group(1))]
            m = re.fullmatch(r"_value\.(\w+)(?:\._key)?", e)
            if m and m.group(1) in keys:
                return g[keys.index(m.group(1))]
            m = re.fullmatch(r"_(sum|max|min|avg)", e)
            if m:
                return agg(st, m.group(1))
            if len(keys) == 1 and keys[0] in t.ref_cols:
                # drilldown on a reference column: the group records ARE
                # referenced-table records, so their data columns output
                # directly (grn_select_drilldown result table keyed by the
                # range table, proc.c:705-783)
                ref = self.tables[t.ref_cols[keys[0]]]
                if e in ref.types:
                    row = next(
                        (
                            x for x in ref.rows
                            if str(x.get("_key", "")) == str(g[0])
                        ),
                        None,
                    )
                    dflt = {"string": "", "long": 0, "double": 0.0,
                            "boolean": False}
                    ty = dict(ref.columns).get(e, "string")
                    fallback = [] if ty.startswith("array") else dflt.get(ty, "")
                    if row is None:
                        return fallback
                    v = row.get(e)
                    return fallback if v is None else v
            raise Unsupported(f"drilldown output column {e!r}")

        ordered = list(order)
        sortby = spec.get("sortby")
        if sortby:
            for part in reversed([p.strip() for p in sortby.split(",")]):
                desc = part.startswith("-")
                name = part.lstrip("+-")
                ordered.sort(key=lambda g: cell(g, name), reverse=desc)
        n_groups = len(ordered)
        off = int(spec.get("offset", 0))
        lim = int(spec.get("limit", 10))
        if off < 0:
            off = max(n_groups + off, 0)
        if lim < 0:
            lim = max(n_groups + lim + 1 - off, 0)
        ordered = ordered[off : off + lim]
        out_cols = [
            c.strip()
            for c in (spec.get("output_columns") or "_key, _nsubrecs").split(",")
        ]
        rows_out = [[cell(g, e) for e in out_cols] for g in ordered]
        # header names strip the _value. accessor prefix
        # (labeled/calc_types/multiple: _value.tag → "tag")
        names = [
            e[len("_value."):] if e.startswith("_value.") else e
            for e in out_cols
        ]
        return (n_groups, names, rows_out)

    def _resolve_match_columns(
        self, spec: str, t: _Table
    ) -> "tuple[str, str | None]":
        """Resolve a ``--match_columns`` spec to plain source columns and
        an optional scorer override.  Handles scorer wrappers
        (``scorer_tf_at_most(col, 3)`` — match_columns/scorer/*), index
        column names (``Lexicon.idx``), per-section selections
        (``Lexicon.idx.title`` / ``Lexicon.idx[0]``), and ``* weight``."""
        out: list[str] = []
        scorers: set[str] = set()
        caps: dict[str, float] = {}  # per-column tf_at_most caps
        self._mc_lexicon = None  # Lexicon named explicitly in the spec
        for e in (x.strip() for x in spec.split("||")):
            w = None
            m = re.fullmatch(r"(.+?)\s*\*\s*(\d+(?:\.\d+)?)", e)
            if m:
                e, w = m.group(1).strip(), m.group(2)
            sm = re.fullmatch(
                r"scorer_(\w+)\(\s*([^,()]+?)\s*(?:,\s*([\d.]+)\s*)?\)", e
            )
            cols_of_entry: list[str] = []
            if sm:
                fn, inner, arg = sm.groups()
                if fn == "tf_at_most" and arg is not None:
                    scorers.add("tf_at_most")
                elif fn == "tf_idf":
                    scorers.add("tf_idf")
                else:
                    raise Unsupported(f"match scorer {fn}")
                e = inner.strip()
            for c in self._expand_mc_spec(e, t):
                out.append(f"{c} * {w}" if w else c)
                cols_of_entry.append(c)
            if sm and sm.group(1) == "tf_at_most":
                for c in cols_of_entry:
                    caps[c.split(".")[-1]] = float(sm.group(3))
        if len(scorers) > 1:
            raise Unsupported("mixed match_columns scorers")
        scorer = scorers.pop() if scorers else None
        if scorer == "tf_at_most":
            # per-section caps ride by column name; the engine resolves
            # them to sections (scorer_tf_at_most applies per
            # match_columns entry — match_columns/scorer/tf_at_most/*)
            scorer = "tf_at_most:" + ",".join(
                f"{c}={v}" for c, v in caps.items()
            )
        return " || ".join(out), scorer

    def _expand_mc_spec(self, e: str, t: _Table) -> list[str]:
        if e in t.types or e == "_key":
            return [e]
        base = e.split(".")[0]
        if base in t.ref_cols or base in t.vector_ref_cols:
            return [e]  # nested reference path — resolved by the caller
        m = re.fullmatch(r"(\w+)\.(\w+)(?:\.(\w+))?(?:\[(\d+)\])?", e)
        if m:
            lex, idx, secname, secnum = m.groups()
            for lx, nm, _fl, _st, srcs in self.index_defs:
                if lx == lex and nm == idx:
                    # naming the lexicon picks ITS tokenizer for the match
                    # even when another index over the same source was
                    # created later (match_columns/section/by_name/1_item/
                    # multiple_indexes)
                    if lex in self.tables:
                        self._mc_lexicon = self.tables[lex]
                    sources = srcs.split(",")
                    if secname is not None:
                        if secname not in sources:
                            raise QueryParseError(
                                f"unknown index section {e!r}"
                            )
                        return [secname]
                    if secnum is not None:
                        if int(secnum) >= len(sources):
                            raise QueryParseError(
                                f"section number out of range {e!r}"
                            )
                        return [sources[int(secnum)]]
                    return sources
        # the reference answers an unresolvable match column with an
        # error response (match_columns/invalid/*)
        raise QueryParseError(f"invalid match column {e!r}")

    def _expand_query(self, spec: str, query: str, qflags) -> str:
        """``--query_expander Table.column`` (proc.c expand_query →
        grn_expr_syntax_expand_query): each term/phrase word of the query
        that is a key of Table is replaced by the column's value — a query-
        syntax snippet — parsed and spliced into the AST (one pass, not
        recursive).  Vector columns OR their elements."""
        from .query.parser import (
            And, ColumnOp, Near, Not, Or, Phrase, Term,
            ast_to_query, parse_query, parse_query_ex,
        )

        if spec == "QueryExpanderTSV":
            # the TSV plugin (plugins/query_expanders/tsv.c): the synonyms
            # file rides in via #@copy-path; each row is key TAB snippet…
            if "query_expanders/tsv" not in self.plugins:
                # unregistered (or plugin_unregister'd) proc name falls
                # through to column lookup → rc -22
                # (plugin_unregister/existence)
                raise QueryParseError(
                    "nonexistent query expansion column: "
                    "<QueryExpanderTSV>"
                )
            tsv = self._tsv_synonyms()
            if tsv is None:
                raise Unsupported("QueryExpanderTSV without a synonyms file")
            mapping: dict[str, object] = dict(tsv)

            def lookup(text: str):
                return mapping.get(text)

        elif spec.startswith("QueryExpander"):
            raise Unsupported(f"query expander plugin {spec}")
        else:
            tname, _, col = spec.partition(".")
            src = self.tables.get(tname)
            if src is None or all(n != col for n, _ in src.columns):
                raise QueryParseError(
                    f"nonexistent query expansion column: <{spec}>"
                )
            mapping = {}
            for r in src.rows:
                k = str(r.get("_key", ""))
                if src.key_normalize:
                    k = _norm_key(k)
                v = r.get(col)
                if v not in (None, "", []):
                    mapping[k] = v

            def lookup(text: str):
                if src.key_normalize:
                    return mapping.get(_norm_key(text))
                return mapping.get(text)

        def sub_ast(v, quoted_word=False):
            # a vector value ORs its element snippets (vector/* fixtures);
            # expanding a QUOTED word splices vector elements in REVERSE
            # (vector/phrase expects the 2nd element's docs first while
            # scalar/phrase — same snippet as one string — is in order)
            snippets = v if isinstance(v, list) else [v]
            if quoted_word and isinstance(v, list):
                snippets = list(reversed(snippets))
            parsed = [parse_query(str(s)) for s in snippets]
            return parsed[0] if len(parsed) == 1 else Or(parsed)

        def walk(node):
            if isinstance(node, Term):
                v = lookup(node.text)
                if v is None:
                    return node
                rep = sub_ast(v)
                if node.prefix and isinstance(rep, Term) and not rep.prefix:
                    # 'mroon*' with mroon→groon stays a PREFIX search
                    return Term(rep.text, prefix=True)
                return rep
            if isinstance(node, Phrase):
                v = lookup(node.text)
                return node if v is None else sub_ast(v, quoted_word=True)
            if isinstance(node, ColumnOp):
                if node.op not in ("match", "equal", "prefix", "suffix"):
                    return node
                v = lookup(node.value)
                if v is None:
                    return node
                rep = sub_ast(v)

                def retarget(n):
                    # re-aim the snippet at the original column/op
                    if isinstance(n, Term):
                        return ColumnOp(node.column, node.op, n.text)
                    if isinstance(n, Phrase):
                        return ColumnOp(node.column, node.op, n.text, quoted=True)
                    if isinstance(n, (And, Or)):
                        return type(n)([retarget(c) for c in n.children])
                    raise QueryParseError("unexpandable column snippet")

                return retarget(rep)
            if isinstance(node, (And, Or)):
                return type(node)([walk(c) for c in node.children])
            if isinstance(node, Not):
                return Not(walk(node.positive), walk(node.negative))
            return node

        try:
            ast, _prag = parse_query_ex(query, flags=qflags)
        except QueryParseError:
            return query  # malformed query: let the normal path report it
        if ast is None:
            return query  # *S/*T mode pragmas: no word expansion
        return ast_to_query(walk(ast))

    def _query_keywords(self, args: dict) -> list[str]:
        """Condition keywords for snippet/highlight functions
        (grn_expr_get_keywords: the constants of match-family nodes,
        positive branches only)."""
        from .query.parser import (
            And, ColumnOp, Near, Not, Or, Phrase, Term, parse_query_ex,
        )

        kws: list[str] = []

        def add(k: str):
            if k and k not in kws:
                kws.append(k)

        q = args.get("query")
        if q:
            try:
                ast, prag = parse_query_ex(q, flags=args.get("query_flags"))
            except QueryParseError:
                ast, prag = None, None

            def walk(n):
                if isinstance(n, Term):
                    add(n.text)
                elif isinstance(n, (Phrase, Near)):
                    add(n.text)
                elif isinstance(n, ColumnOp):
                    if n.op in ("match", "prefix", "suffix"):
                        add(n.value)
                elif isinstance(n, (And, Or)):
                    for c in n.children:
                        walk(c)
                elif isinstance(n, Not):
                    walk(n.positive)  # negated keywords aren't highlighted

            if ast is not None:
                walk(ast)
        f = args.get("filter")
        if f:
            for m in re.finditer(r'@~?\^?\$?\s*"((?:[^"\\]|\\.)*)"', f):
                add(m.group(1).replace('\\"', '"').replace("\\\\", "\\"))
        return kws

    def _or_branch_rank(
        self, table: str, t: _Table, args: dict
    ) -> "dict[int, int] | None":
        """_id → rank for a posting-driven top-level OR without --sortby:
        the reference's result set accumulates branch by branch (second
        operand ADDs to the set — grn_table_select), so output order is
        branch order, ids ascending within a branch, first occurrence wins
        (query_expander/*/not_recursive: rroonga-branch doc precedes the
        groonga-branch docs).

        One twist from scan_info_build's put_logical_op (expr.c:3608-3669):
        when the FIRST complex operand (a parenthesised AND / AND-NOT
        group, ndifops > 0) is OR-merged into a so-far-simple prefix, the
        scan infos are ROTATED so the group's select runs first and the
        prefix is OR'd in afterwards — ``a OR (b c)`` emits the (b AND c)
        docs before the a docs (plugin_register/existence: expansion
        ``((rroonga) OR ((Ruby groonga)))`` lists doc 2 before doc 1).
        Later complex operands go through the res-stack PUSH/POP branch
        instead and append normally.  This applies even with no index at
        all: grn_table_select runs one sequential pass per scan info
        (expr.c:5394), so pure-scan ORs with a complex child follow the
        same rotated branch order."""
        from .query.parser import And, Not, Or, ast_to_query, parse_query_ex

        scalar_indexed = [
            c for c in t.indexed_cols
            if c not in t.vector_cols and c not in t.ref_cols
        ]
        if args.get("query") is None:
            return None
        try:
            ast, _prag = parse_query_ex(
                args.get("query"), flags=args.get("query_flags")
            )
        except QueryParseError:
            return None
        if not isinstance(ast, Or):
            return None
        has_complex = any(
            isinstance(c, (And, Not)) for c in ast.children
        )
        if not has_complex:
            # simple-term-only OR: branch order only applies on the
            # posting-driven path; pure scans stay in table-cursor (id)
            # order (no deletes ever happen, so slot order is plain
            # insertion order — keep the prior cheap rule)
            if not scalar_indexed:
                return None
            if self._ast_all_scan(
                ast, t, set(args.get("scan_columns") or ())
            ):
                return None
        # keep the dynamic columns that BACK match columns (flattened
        # nested references like owner.name → __nm0) — dropping them
        # breaks the branch select and loses branch ordering
        # (index/nested/match_columns/*/or)
        mc_cols = {
            k: v
            for k, v in (args.get("columns") or {}).items()
            if k in (args.get("text_cols") or ())
        }

        def atom_ids(node) -> "list[int] | None":
            """ids matching one scan-info atom, in insertion order (doc-id
            ascending: posting lists are id-sorted, scans are cursor
            order)."""
            try:
                q = ast_to_query(node)
            except QueryParseError:
                return None
            sub = dict(
                args,
                query=q,
                filter=None,
                output_columns="_id",
                sortby="_id",
                offset=0,
                limit=-1,
                columns=mc_cols or None,
            )
            try:
                rows = self.ctx.select(table, **sub)["records"].collect()
            except _SELECT_ERRORS:
                return None
            return [r["_id"] for r in rows]

        GROUP = (And, Not)

        def expand(node) -> "list[tuple[str, object]] | None":
            """One operand's scan-info steps [(logical_op, atom)] —
            None for shapes the simulation doesn't model (nested
            groups); the caller then falls back to legacy branch order."""
            if isinstance(node, And):
                steps = []
                for k, ch in enumerate(node.children):
                    if isinstance(ch, (And, Or, Not)):
                        return None
                    steps.append(("OR" if k == 0 else "AND", ch))
                return steps
            if isinstance(node, Not):
                if isinstance(node.negative, (And, Or, Not)):
                    return None
                if isinstance(node.positive, Or):
                    return None
                pos = expand(node.positive)
                if pos is None:
                    return None
                return pos + [("AND_NOT", node.negative)]
            if isinstance(node, Or):
                return None
            return [("OR", node)]

        # assemble top-level execution order per put_logical_op: the
        # FIRST group merged into a so-far-simple prefix rotates to the
        # front; a group merged after any earlier group goes through the
        # res-stack (PUSH/POP) and its result is OR-inserted afterwards
        program: "list[tuple[str, list]] | None" = []
        seen_complex = False
        for i, child in enumerate(ast.children):
            steps = expand(child)
            if steps is None:
                program = None
                break
            if isinstance(child, GROUP) and i == 0:
                program.append(("inline", steps))
                seen_complex = True
            elif isinstance(child, GROUP) and not seen_complex:
                program.insert(0, ("inline", steps))  # rotation
                seen_complex = True
            elif isinstance(child, GROUP):
                program.append(("merge", steps))
            else:
                program.append(("inline", steps))

        if program is None:
            # legacy branch-append rule (first occurrence wins)
            if not scalar_indexed or self._ast_all_scan(
                ast, t, set(args.get("scan_columns") or ())
            ):
                return None
            rank: dict[int, int] = {}
            for child in ast.children:
                ids = atom_ids(child)
                if ids is None:
                    return None
                for _id in ids:
                    if _id not in rank:
                        rank[_id] = len(rank)
            return rank

        def run(prog) -> "list[int] | None":
            """Simulate the result grn_hash: slot-indexed entries with a
            LIFO garbage list (hash.c:801-822 pushes freed slots on the
            head; allocation reuses the head), iterated slot-ascending."""
            slots: list = []
            pos: dict = {}
            garbage: list = []

            def insert(_id):
                if _id in pos:
                    return
                if garbage:
                    s = garbage.pop()
                    slots[s] = _id
                else:
                    s = len(slots)
                    slots.append(None)
                    slots[s] = _id
                pos[_id] = s

            def delete(_id):
                s = pos.pop(_id)
                slots[s] = None
                garbage.append(s)

            for kind, steps in prog:
                if kind == "merge":
                    sub = run([("inline", steps)])
                    if sub is None:
                        return None
                    for _id in sub:
                        insert(_id)
                    continue
                for lop, atom in steps:
                    ids = atom_ids(atom)
                    if ids is None:
                        return None
                    if lop == "OR":
                        for _id in ids:
                            insert(_id)
                    elif lop == "AND":
                        keep = set(ids)
                        # setoperation iterates the hash cursor (slot
                        # order), so slots free low-to-high → LIFO pop
                        # reuses the highest freed slot first
                        for _id in [
                            x for x in slots
                            if x is not None and x not in keep
                        ]:
                            delete(_id)
                    else:  # AND_NOT
                        for _id in ids:
                            if _id in pos:
                                delete(_id)
            return [x for x in slots if x is not None]

        order = run(program)
        if order is None:
            return None
        return {v: i for i, v in enumerate(order)}

    def _natural_rank(self, t: _Table, args: dict) -> "dict[int, int] | None":
        """_id → output rank for selects WITHOUT --sortby whose natural
        (result-set) order is not id order.  The reference emits records in
        result-table insertion order; for key-trie driven searches that is
        the trie cursor order:

        - full scan of a PAT/DAT table → ascending key order (pat/dat
          cursor default, suffix_search/patricia_trie_key_with_sis.test)
        - ``_key:^x`` → pat: DESCENDING key order
          (escape/prefix_search.test), dat: ascending
          (prefix_search/double_array_trie.test)
        - ``_key:$x`` on KEY_WITH_SIS → SIS walk order (sis_order)
        - prefix/suffix via an untokenized lexicon → same trie orders over
          the indexed column's VALUES

        Everything else (posting-list driven matches, scans) is id order —
        returns None and the normal sortby=_id path serves it."""
        query = args.get("query")
        if not t.keys and not t.rows:
            return None
        norm = _norm_key if "KEY_NORMALIZE" in t.flags else (lambda s: s)
        ast = None
        if query is not None:
            from .query.parser import parse_query_ex

            try:
                ast, _prag = parse_query_ex(query, flags=args.get("query_flags"))
            except QueryParseError:
                return None

        def rank_keys(ordered_keys: list[str]) -> dict[int, int]:
            pos = {k: i for i, k in enumerate(ordered_keys)}
            return {
                r["_id"]: pos[str(r.get("_key", ""))]
                for r in t.rows
                if str(r.get("_key", "")) in pos
            }

        if query is None and args.get("filter"):
            # a pure index-column sub_filter emits locals in the FOREIGN
            # match order (the index walk inserts the source records'
            # owners as they come — sub_filter/column/index)
            m = re.fullmatch(
                r'\s*sub_filter\(\s*([A-Za-z_]\w*)\s*,'
                r'\s*"((?:[^"\\]|\\.)*)"\s*\)\s*',
                args["filter"],
            )
            mode = None
            if m and t.keyed:
                if m.group(1) in t.index_cols:
                    st, sc = t.index_cols[m.group(1)]
                    mode = "index"
                elif m.group(1) in t.vector_ref_cols:
                    st, sc = t.vector_ref_cols[m.group(1)], "_key"
                    mode = "vector"
            if mode is not None:
                ft = self.tables[st]
                expr = m.group(2).replace('\\"', '"')
                for col in ft.ref_cols:
                    expr = re.sub(
                        rf"\b{re.escape(col)}\b(?!\s*\.)", f"{col}._key", expr
                    )
                from .query.script import parse_filter

                try:
                    sel = f"{sc}._key" if sc in ft.ref_cols else sc
                    cols = ["_id", f"{sel} as __fk"]
                    if ft.keyed:
                        cols.append("_key as __sortk")
                    frows = (
                        self.ctx.dump(st)
                        .filter(parse_filter(expr))
                        .selectExpr(*cols)
                        .collect()
                    )
                except _SELECT_ERRORS:
                    frows = None
                if frows is not None:
                    # the sub-expression scans the foreign table's cursor:
                    # pat/dat → ascending KEY order, hash/array → id order
                    # (sub_filter/column/{index,vector})
                    fnorm = (
                        _norm_key if "KEY_NORMALIZE" in ft.flags
                        else (lambda s: s)
                    )
                    if (ft.pat or ft.dat) and ft.keyed:
                        frows = sorted(
                            frows, key=lambda r: fnorm(str(r["__sortk"]))
                        )
                    else:
                        frows = sorted(frows, key=lambda r: r["_id"])
                    order: list[str] = []
                    if mode == "index":
                        for r in frows:
                            if str(r["__fk"]) not in order:
                                order.append(str(r["__fk"]))
                    else:
                        # vector mode: owners of each matched foreign key,
                        # walking the local rows per foreign hit
                        for r in frows:
                            fk = str(r["__fk"])
                            for lr in t.rows:
                                vals = lr.get(m.group(1)) or []
                                k = str(lr.get("_key", ""))
                                if fk in [str(v) for v in vals] and k not in order:
                                    order.append(k)
                    return rank_keys(order)
        if query is None and args.get("filter"):
            # a filter whose every atom ranges over ONE reference path
            # walks the foreign index in VALUE order (nested/by_column/
            # range/*: rows come back ordered by owner.birthday /
            # score._key ascending)
            f = args["filter"]
            paths = set(re.findall(r"\b([A-Za-z_]\w*\.[A-Za-z_]\w*)\b", f))
            plain_cols = {
                w for w in re.findall(r"\b([A-Za-z_]\w*)\b(?![\w.(])", f)
            } & set(t.types)
            if len(paths) == 1 and not plain_cols and "sub_filter" not in f:
                base, attr = next(iter(paths)).split(".", 1)
                if base in t.ref_cols:
                    ft = self.tables[t.ref_cols[base]]
                    lut = {
                        str(r.get("_key", "")): (
                            r.get("_key") if attr == "_key" else r.get(attr)
                        )
                        for r in ft.rows
                    }

                    def val(r):
                        v = lut.get(str(r.get(base, "")))
                        return (v is None, v, r["_id"])

                    ordered = sorted(t.rows, key=val)
                    return {r["_id"]: i for i, r in enumerate(ordered)}
        if query is None and args.get("filter") is None:
            if t.pat or t.dat:
                return rank_keys(sorted(t.keys, key=norm))
            return None
        if ast is None:
            return None
        from .query.parser import ColumnOp, Term

        if isinstance(ast, ColumnOp) and ast.column == "_key":
            if ast.op == "prefix" and (t.pat or t.dat):
                return rank_keys(sorted(t.keys, key=norm, reverse=t.pat))
            if ast.op == "suffix" and t.sis:
                return rank_keys(sis_order(t.keys, ast.value))
        if t.untok_index and t.indexed_cols:
            col = t.indexed_cols[0]
            vals = [str(r.get(col, "")) for r in t.rows]
            if isinstance(ast, Term) and ast.prefix:
                # whole-value prefix over a pat lexicon: descending
                order = {
                    v: i for i, v in enumerate(sorted(set(vals), reverse=True))
                }
                return {
                    r["_id"]: order[str(r.get(col, ""))] for r in t.rows
                }
            if (
                isinstance(ast, ColumnOp)
                and ast.column == col
                and ast.op == "suffix"
                and t.lex_sis
            ):
                walk = sis_order(sis_expand(vals), ast.value)
                pos = {k: i for i, k in enumerate(walk)}
                return {
                    r["_id"]: pos.get(str(r.get(col, "")), 1 << 60)
                    for r in t.rows
                }
        # generic scan rule: a select whose evaluation never touches a
        # posting list is a sequential scan over the table cursor, and the
        # pat/dat cursor walks in ascending key order (the
        # query_flags/allow_leading_not fixture: the complement is a scan
        # and the TABLE_PAT_KEY output comes back key-ordered)
        if t.pat or t.dat:
            scan_cols = set(args.get("scan_columns") or ())
            if ast is not None:
                if self._ast_all_scan(ast, t, scan_cols):
                    return rank_keys(sorted(t.keys, key=norm))
            elif args.get("filter") is not None:
                f = args["filter"]
                if "query(" not in f and ("@" not in f or not t.indexed_cols):
                    return rank_keys(sorted(t.keys, key=norm))
        return None

    def _ast_all_scan(self, node, t: _Table, scan_cols: set) -> bool:
        """True when every atom of the query AST evaluates by sequential
        scan (no posting-list-driven atom) — then the result order is the
        table cursor order, not posting/insertion order."""
        from .query.parser import (
            AllRecords, And, ColumnOp, Near, Not, Or, Phrase, Term,
        )

        scalar_indexed = [
            c for c in t.indexed_cols
            if c not in t.vector_cols and c not in t.ref_cols
        ]
        if isinstance(node, (Term, Phrase, Near)):
            return not scalar_indexed
        if isinstance(node, ColumnOp):
            if node.op in ("match", "prefix", "suffix"):
                return node.column not in scalar_indexed or node.column in scan_cols
            return True  # comparisons / regexp scan
        if isinstance(node, AllRecords):
            return True
        if isinstance(node, (And, Or)):
            return all(self._ast_all_scan(c, t, scan_cols) for c in node.children)
        if isinstance(node, Not):
            # the result set is built from the POSITIVE side; the negative
            # side only deletes from it, which never reorders the cursor
            return self._ast_all_scan(node.positive, t, scan_cols)
        return False

    def _col_name(self, c: str) -> str:
        return {"_score": "score"}.get(c, c)

    @staticmethod
    def _out_val(v):
        # _score's int cast happens at its output site; every other float
        # column stays a float (Time values print as 1423025400.0)
        if hasattr(v, "__fields__"):  # Row = reference column → its key
            return v["_key"]
        return v

    # -- suggest dataset (plugins/suggest/suggest.c) ----------------------

    @staticmethod
    def _suggest_rows(payload: str) -> list[dict]:
        rows = json.JSONDecoder().raw_decode((payload or "").strip())[0]
        if rows and isinstance(rows[0], list) and rows[0] and all(
            isinstance(x, str) for x in rows[0]
        ):
            header = rows[0]
            rows = [
                dict(zip(header, r))
                for r in rows[1:]
                if isinstance(r, list) and len(r) == len(header)
            ]
        return [r for r in rows if isinstance(r, dict)]

    def _suggest_load(self, argv, payload) -> "int | None":
        """Route ``load`` into a suggest dataset; None → not ours."""
        _pos, kw = self._kw(argv)
        table = kw.get("table", "")
        if table == "configuration" and "configuration" not in self.tables:
            rows = self._suggest_rows(payload)
            return max(
                ds.load_configuration(rows)
                for ds in self.suggest_datasets.values()
            )
        for prefix, kind in (("item_", "items"), ("event_", "events")):
            if table.startswith(prefix):
                ds = self.suggest_datasets.get(table[len(prefix):])
                if ds is None:
                    continue
                rows = self._suggest_rows(payload)
                if kind == "items":
                    return ds.load_items(rows)
                if "suggest_preparer" not in kw.get("each", ""):
                    raise Unsupported(
                        f"event load without suggest_preparer: {kw}"
                    )
                return ds.learn_events(rows)
        return None

    def suggest_cmd(self, argv) -> _Resp:
        """The ``suggest`` command (command_suggest, suggest.c:547-629)."""
        pos, kw = self._kw(argv)
        vars_ = [
            "types", "table", "column", "query", "sortby", "output_columns",
            "offset", "limit", "frequency_threshold",
            "conditional_probability_threshold", "prefix_search",
            "similar_search",
        ]
        for i, v in enumerate(pos):
            if i < len(vars_) and vars_[i] not in kw:
                kw[vars_[i]] = v
        table = kw.get("table", "")
        if not table.startswith("item_"):
            return _Resp("ERROR")
        ds = self.suggest_datasets.get(table[len("item_"):])
        if ds is None:
            return _Resp("ERROR")

        def mode(s):
            s = (s or "").lower()
            return s if s in ("yes", "no") else "auto"

        if kw.get("sortby") or kw.get("output_columns"):
            raise Unsupported("suggest custom sortby/output_columns")
        body = ds.run(
            types=kw.get("types", ""),
            query=kw.get("query", ""),
            frequency_threshold=int(kw.get("frequency_threshold") or 100),
            conditional_probability_threshold=float(
                kw.get("conditional_probability_threshold") or 0.2
            ),
            prefix_search=mode(kw.get("prefix_search")),
            similar_search=mode(kw.get("similar_search")),
            limit=int(kw.get("limit") or 10),
            offset=int(kw.get("offset") or 0),
        )
        return _Resp(body)

    def run(self, script_text: str) -> dict[str, object]:
        """Execute a script; → {command_line: comparable result}.  A
        ``select`` yields its result-table tuples; every other supported
        command yields a :class:`_Resp` whose body is compared verbatim
        against the reference's recorded response."""
        out = {}
        occ: dict[str, int] = {}
        for raw, argv, payload in parse_script(script_text):
            name = argv[0]
            # occurrence-indexed key: the same command line may repeat
            # with different responses (dump before/after table_remove)
            norm_cmd = re.sub(r"\s+", " ", raw.strip())
            raw = (norm_cmd, occ.setdefault(norm_cmd, 0))
            occ[norm_cmd] += 1
            if name == "#copy-path":
                import os as _os

                self.fixture_files[argv[2]] = _os.path.join(
                    INCLUDE_BASE, argv[1]
                )
                continue  # directive: no recorded response
            if name == "#suggest-create-dataset":
                from .suggest_dataset import SuggestDataset

                self.suggest_datasets[argv[1]] = SuggestDataset(argv[1])
                continue  # directive: no recorded response
            if name == "load" and self.suggest_datasets:
                routed = self._suggest_load(argv, payload)
                if routed is not None:
                    out[raw] = _Resp(routed)
                    continue
            if name == "table_create":
                ok = self.table_create(argv)
                out[raw] = _Resp(True if ok is not False else "ERROR")
            elif name == "column_create":
                ok = self.column_create(argv)
                out[raw] = _Resp(True if ok is not False else "ERROR")
            elif name == "load":
                if self._kw(argv)[1].get("table") not in self.tables:
                    out[raw] = _Resp("ERROR")  # table_create failed → rc<0
                else:
                    try:
                        out[raw] = _Resp(self.load(argv, payload))
                    except ScriptSyntaxError:
                        out[raw] = _Resp("ERROR")
            elif name == "select":
                try:
                    out[raw] = self.select(argv)
                except _SELECT_ERRORS:
                    # reference answers malformed queries/filters with an
                    # error response (rc<0), not a crash — match
                    # kind-for-kind (an unexpected error still FAILS the
                    # compare unless the reference errored too)
                    out[raw] = ("ERROR",)
            elif name == "tokenize":
                out[raw] = self.tokenize_cmd(argv)
            elif name == "table_tokenize":
                out[raw] = self.table_tokenize_cmd(argv)
            elif name == "table_list":
                out[raw] = self.table_list_cmd(argv)
            elif name == "column_list":
                out[raw] = self.column_list_cmd(argv)
            elif name == "table_remove":
                out[raw] = self.table_remove_cmd(argv)
            elif name == "column_remove":
                out[raw] = self.column_remove_cmd(argv)
            elif name == "column_rename":
                out[raw] = self.column_rename_cmd(argv)
            elif name == "normalize":
                out[raw] = self.normalize_cmd(argv)
            elif name == "truncate":
                out[raw] = self.truncate_cmd(argv)
            elif name == "delete":
                out[raw] = self.delete_cmd(argv)
            elif name == "cache_limit":
                out[raw] = self.cache_limit_cmd(argv)
            elif name == "range_filter":
                try:
                    out[raw] = self.range_filter_cmd(argv)
                except _SELECT_ERRORS:
                    out[raw] = _Resp("ERROR")
            elif name == "suggest":
                out[raw] = self.suggest_cmd(argv)
            elif name == "tokenizer_list":
                # registration order (lib/tokenizers.c:783-828 + the
                # mecab plugin grntest loads first)
                out[raw] = _Resp([
                    {"name": n} for n in (
                        "TokenMecab", "TokenDelimit", "TokenUnigram",
                        "TokenBigram", "TokenTrigram",
                        "TokenBigramSplitSymbol",
                        "TokenBigramSplitSymbolAlpha",
                        "TokenBigramSplitSymbolAlphaDigit",
                        "TokenBigramIgnoreBlank",
                        "TokenBigramIgnoreBlankSplitSymbol",
                        "TokenBigramIgnoreBlankSplitSymbolAlpha",
                        "TokenBigramIgnoreBlankSplitSymbolAlphaDigit",
                        "TokenDelimitNull", "TokenRegexp",
                    )
                ])
            elif name == "normalizer_list":
                # lib/normalizer.c:1177-1191 registration order
                out[raw] = _Resp([
                    {"name": "NormalizerAuto"},
                    {"name": "NormalizerNFKC51"},
                ])
            elif name in ("register", "plugin_register"):
                out[raw] = self.register_cmd(argv)
            elif name == "plugin_unregister":
                mod = argv[1] if len(argv) > 1 else ""
                if mod in self.plugins:
                    self.plugins.remove(mod)
                out[raw] = _Resp(True)
            elif name == "request_cancel":
                # no in-flight requests in a replay: always not-canceled
                # (lib/proc.c request_canceler_cancel)
                rid = argv[1] if len(argv) > 1 else ""
                out[raw] = _Resp({"id": rid, "canceled": False})
            elif name == "dump":
                out[raw] = self.dump_cmd(argv)
            elif name == "logical_count":
                try:
                    out[raw] = self.logical_count_cmd(argv)
                except _SELECT_ERRORS:
                    out[raw] = _Resp("ERROR")
            elif name == "logical_range_filter":
                try:
                    out[raw] = self.logical_range_filter_cmd(argv)
                except _SELECT_ERRORS:
                    out[raw] = _Resp("ERROR")
            else:
                raise Unsupported(f"command {name}")
        return out

    # -- sharding (plugins/sharding/*.rb): the logical table is the union
    #    of per-day physical shards ------------------------------------------

    def _shards(self, logical: str) -> list[str]:
        pat = re.compile(rf"^{re.escape(logical)}_(\d+)$")
        hits = sorted(
            (m.group(1), n) for n in self.tables if (m := pat.match(n))
        )
        return [n for _, n in hits]

    def _shard_range_rows(self, argv):
        """Common logical_* machinery → (rows, table_proto, kw) where rows
        ride shard order then (shard_key, _id) order, already range- and
        filter-restricted engine-side."""
        from .query.script import parse_filter

        pos, kw = self._kw(argv)
        logical = kw.get("logical_table") or (pos[0] if pos else None)
        shard_key = kw.get("shard_key") or (pos[1] if len(pos) > 1 else None)
        if not logical or not shard_key:
            return None, None, kw
        shards = self._shards(logical)
        if not shards:
            return None, None, kw
        proto = self.tables[shards[0]]
        is_time = proto.types.get(shard_key) == "Time"

        def lit(v):
            return repr(_parse_time(v)) if is_time else v

        conds = []
        if "min" in kw:
            op = ">=" if kw.get("min_border", "include") == "include" else ">"
            conds.append(f"{shard_key} {op} {lit(kw['min'])}")
        if "max" in kw:
            op = "<=" if kw.get("max_border", "include") == "include" else "<"
            conds.append(f"{shard_key} {op} {lit(kw['max'])}")
        if kw.get("filter"):
            conds.append(f"({kw['filter']})")
        rows = []
        for s in shards:
            if not self.tables[s].loaded:
                self._ingest(s, [])
            df = self.ctx.dump(s)
            if conds:
                df = df.filter(parse_filter(" && ".join(conds)))
            shard_rows = sorted(
                df.collect(), key=lambda r: (r[shard_key], r["_id"])
            )
            rows.append(shard_rows)
        return rows, proto, kw

    def logical_count_cmd(self, argv) -> _Resp:
        """``logical_count`` (plugins/sharding/logical_count.rb): count
        across the shard range."""
        rows, proto, kw = self._shard_range_rows(argv)
        if rows is None:
            return _Resp("ERROR")
        return _Resp(sum(len(r) for r in rows))

    def logical_range_filter_cmd(self, argv) -> _Resp:
        """``logical_range_filter`` (logical_range_filter.rb): ordered
        slice across shards — shards walked in date order (reverse for
        descending), rows by shard_key within each; default output is the
        DATA columns sorted by name (no pseudo columns), types in the
        header."""
        rows, proto, kw = self._shard_range_rows(argv)
        if rows is None:
            return _Resp("ERROR")
        order = kw.get("order", "ascending")
        if order not in ("ascending", "descending"):
            return _Resp("ERROR")
        flat = []
        shard_list = rows if order == "ascending" else list(reversed(rows))
        for shard_rows in shard_list:
            flat.extend(
                shard_rows if order == "ascending" else list(reversed(shard_rows))
            )
        offset = int(kw.get("offset", 0))
        limit = int(kw.get("limit", -1))
        # grn_normalize_offset_and_limit: negatives wrap against the hit
        # count (limit -1 = all, -3 = all but the last two —
        # sharding/logical_range_filter/limit/negative/*)
        n = len(flat)
        if offset < 0:
            offset = max(n + offset, 0)
        if limit < 0:
            limit = max(n + limit + 1 - offset, 0)
        flat = flat[offset : offset + limit]
        if "output_columns" in kw:
            out_cols = [c.strip() for c in kw["output_columns"].split(",")]
        else:
            out_cols = sorted(n for n, _ in proto.columns)
        header = [
            [c, {"_id": "UInt32", "_key": proto.key_gtype}.get(
                c, proto.types.get(c, "ShortText")
            )]
            for c in out_cols
        ]
        body = [header] + [
            [self._out_val(r[self._col_name(c)]) for c in out_cols]
            for r in flat
        ]
        return _Resp(body)

    # -- non-select commands (responses compared verbatim) ------------------

    _KNOWN_PLUGINS = (
        "sharding", "token_filters/stem", "token_filters/stop_word",
        "query_expanders/tsv", "functions/vector", "suggest/suggest",
    )

    def register_cmd(self, argv) -> _Resp:
        """``register`` / ``plugin_register``: the capabilities these
        fixtures pull in (sharding's logical_*, TokenFilterStem/StopWord)
        are built into this engine, so registration is a successful no-op
        recorded for ``dump``."""
        mod = argv[1] if len(argv) > 1 else ""
        if mod in self._KNOWN_PLUGINS:
            if mod not in self.plugins:
                self.plugins.append(mod)
            return _Resp(True)
        raise Unsupported(f"register {mod}")

    @staticmethod
    def _poskw(pos, kw, i, name, default=None):
        v = kw.get(name)
        if v is not None:
            return v
        return pos[i] if len(pos) > i else default

    @staticmethod
    def _regexp_tokens(s: str, mode: str) -> list[dict]:
        """TokenRegexp tokenization (tokenizers.c:489-730).

        ADD brackets the content with the begin/end marks, emits every
        overlapping bigram per blank-separated run plus each run's final
        single char; positions are CHARACTER offsets (+1 for the begin
        mark), so blanks consume positions (tokenizers/regexp/add/*,
        …/get/normalizer/blank/* ADD responses).

        GET emits no marks unless they are literally in the input (a
        quoted \\A/\\z query); per run, bigrams at stride 2 with the tail
        overlapping back to the last FULL bigram; positions are offsets in
        the blank-less character sequence; the final content token gets
        force_prefix when shorter than the gram and not end-anchored
        (tokenizers/regexp/get/*)."""
        from .tokenize import REGEXP_BEGIN, REGEXP_END

        out: list[dict] = []
        if mode == "ADD":
            out.append(
                {"value": REGEXP_BEGIN, "position": 0, "force_prefix": False}
            )
            for m in re.finditer(r"\S+", s):
                st, run = m.start() + 1, m.group()
                for j in range(len(run)):
                    out.append({
                        "value": run[j : j + 2],
                        "position": st + j,
                        "force_prefix": False,
                    })
            out.append({
                "value": REGEXP_END,
                "position": len(s) + 1,
                "force_prefix": False,
            })
            return out
        begin = s.startswith(REGEXP_BEGIN)
        end = s.endswith(REGEXP_END) and len(s) > (1 if begin else 0)
        body = s[1:] if begin else s
        body = body[:-1] if end else body
        if begin:
            out.append(
                {"value": REGEXP_BEGIN, "position": 0, "force_prefix": False}
            )
        dense = 1 if begin else 0
        last_content = None
        for run in re.split(r"\s+", body):
            if not run:
                continue
            L = len(run)
            if L == 1:
                out.append(
                    {"value": run, "position": dense, "force_prefix": False}
                )
            else:
                p = 0
                while p + 2 <= L:
                    out.append({
                        "value": run[p : p + 2],
                        "position": dense + p,
                        "force_prefix": False,
                    })
                    p += 2
                if p < L:  # 1-char remainder → last full bigram instead
                    out.append({
                        "value": run[L - 2 :],
                        "position": dense + L - 2,
                        "force_prefix": False,
                    })
            dense += L
            last_content = len(out) - 1
        if last_content is not None and not end:
            if len(out[last_content]["value"]) < 2:
                out[last_content]["force_prefix"] = True
        if end:
            out.append(
                {"value": REGEXP_END, "position": dense, "force_prefix": False}
            )
        return out

    def tokenize_cmd(self, argv) -> _Resp:
        """``tokenize`` (proc.c:6372): tokenizer, string, [normalizer,
        flags, mode, token_filters] → [{value, position, force_prefix}]."""
        pos, kw = self._kw(argv)
        tokenizer = self._poskw(pos, kw, 0, "tokenizer")
        if not tokenizer:
            return _Resp("ERROR")  # rc -22 "tokenizer name is missing"
        string = self._poskw(pos, kw, 1, "string")
        if string is None:
            return _Resp("ERROR")
        normalizer = self._poskw(pos, kw, 2, "normalizer")
        flags = self._poskw(pos, kw, 3, "flags", "NONE") or "NONE"
        mode = self._poskw(pos, kw, 4, "mode", "ADD") or "ADD"
        tfs = kw.get("token_filters", "")
        if tokenizer in ("TokenMecab", "TokenKytea"):
            raise Unsupported(f"tokenizer {tokenizer}")
        key = TOKENIZER_MAP.get(tokenizer)
        if key is None:
            return _Resp("ERROR")  # nonexistent tokenizer name
        # argument validation (proc.c proc_tokenize: rc -22 on unknown
        # mode / flag / normalizer — tokenize/invalid/*)
        if mode not in ("ADD", "GET"):
            return _Resp("ERROR")
        if any(
            f.strip() not in ("NONE", "ENABLE_TOKENIZED_DELIMITER", "")
            for f in flags.replace("|", " ").split()
        ):
            return _Resp("ERROR")
        if normalizer == "NormalizerNFKC51":
            normalizer = "NormalizerAuto"  # same ASCII behavior
        if normalizer and normalizer not in ("NONE", "NormalizerAuto"):
            # a tokenizer name or an unregistered Normalizer* both error
            return _Resp("ERROR")
        n = {"unigram": 1, "trigram": 3}.get(key, 2)
        is_ngram = key not in ("delimit", "delimit_null", "code")
        toks: list[tuple[str, int]]
        if key == "regexp" and "ENABLE_TOKENIZED_DELIMITER" not in flags:
            s = string
            if normalizer and normalizer != "NONE":
                from .normalize import normalize

                s = normalize(s)
            return _Resp(self._regexp_tokens(s, mode))
        if "ENABLE_TOKENIZED_DELIMITER" in flags:
            # U+FFFE is an explicit token delimiter; the tokenizer is
            # bypassed (tokenizer.c tokenized-delimiter mode), empty
            # tokens between adjacent delimiters are dropped with a
            # warning
            parts = string.split("￾")
            if normalizer and normalizer != "NONE":
                from .normalize import normalize

                parts = [normalize(p) for p in parts]
            toks = [(p, i) for i, p in enumerate(p for p in parts if p)]
        elif not normalizer or normalizer == "NONE":
            # no normalizer → no character classes: one undifferentiated
            # run, raw sliding n-grams (case/blanks preserved)
            if key in ("delimit", "delimit_null"):
                toks = [(p, i) for i, p in enumerate(string.split())]
            else:
                toks = [(string[i : i + n], i) for i in range(len(string))]
                if mode == "GET" and len(toks) > 1:
                    toks = [t for t in toks if len(t[0]) == n] or toks[:1]
        else:
            from .tokenize import tokenize_batch

            terms, poss = tokenize_batch([string], key)[0]
            toks = list(zip(terms, poss))
            if mode == "GET" and is_ngram:
                # GET cursor skips a short gram the previous FULL gram
                # already covers — both positions and characters
                # (token_cursor.c overlap skip; mode_get and
                # tokenizers/trigram/force_prefix/*/matured)
                kept: list[tuple[str, int]] = []
                for term, p in toks:
                    if len(term) < n and kept:
                        pp, pt = kept[-1][1], kept[-1][0]
                        if (
                            p + len(term) <= pp + len(pt)
                            and pt[p - pp : p - pp + len(term)] == term
                        ):
                            continue
                    kept.append((term, p))
                toks = kept
        too_long = [t for t, _ in toks if len(t.encode("utf-8")) > 4096]
        if too_long:
            # a token beyond GRN_TABLE_MAX_KEY_SIZE is dropped with a
            # warning and does not consume a position
            # (tokenizers/bigram/long_token/*)
            toks = [
                (t, i)
                for i, (t, _p) in enumerate(
                    x for x in toks if len(x[0].encode("utf-8")) <= 4096
                )
            ]
        terms = [t for t, _ in toks]
        if "TokenFilterStem" in tfs:
            from .stem import stem_terms

            terms = stem_terms(terms)
        out = []
        for i, (term, p) in enumerate(toks):
            force = (
                mode == "GET"
                and is_ngram
                and i == len(toks) - 1
                and len(term) < n
                and not term.isascii()
            )
            out.append(
                {"value": terms[i], "position": p, "force_prefix": force}
            )
        return _Resp(out)

    def table_tokenize_cmd(self, argv) -> _Resp:
        """``table_tokenize`` (proc.c:6460): tokenize with a LEXICON
        table's tokenizer/normalizer; GET outputs only tokens already in
        the lexicon, ADD registers new tokens as keys."""
        pos, kw = self._kw(argv)
        table = self._poskw(pos, kw, 0, "table")
        string = self._poskw(pos, kw, 1, "string")
        flags = self._poskw(pos, kw, 2, "flags", "NONE") or "NONE"
        # table_tokenize defaults to GET, unlike tokenize (proc.c:4264)
        mode = self._poskw(pos, kw, 3, "mode", "GET") or "GET"
        t = self.tables.get(table or "")
        if t is None or string is None:
            return _Resp("ERROR")
        if t.tokenizer_raw is None:
            raise Unsupported("table_tokenize without default_tokenizer")
        resp = self.tokenize_cmd(
            [
                "tokenize",
                t.tokenizer_raw,
                string,
                t.normalizer_raw or "NONE",
                flags,
                mode,
            ]
            + (
                ["--token_filters", ",".join(t.token_filters)]
                if t.token_filters
                else []
            )
        )
        if resp.body == "ERROR":
            return resp
        toks = resp.body
        if mode == "GET":
            known = set(t.keys)
            toks = [d for d in toks if d["value"] in known]
            if "TokenFilterStopWord" in t.token_filters:
                # GET-only: lexicon records with is_stop_word=true drop
                # (plugins/token_filters/stop_word.c)
                stops = {
                    str(r.get("_key", ""))
                    for r in t.rows
                    if r.get("is_stop_word")
                }
                toks = [d for d in toks if d["value"] not in stops]
        else:
            seen = set(t.keys)
            new = []
            for d in toks:
                if d["value"] not in seen:
                    seen.add(d["value"])
                    new.append({"_key": d["value"]})
            if new:
                self._ingest(table, new)
        return _Resp(toks)

    # -- XML serialization (lib/output.c grn_output_xml; the select
    # RESULTSET form is the legacy Tritonn/Senna page format) -----------
    @staticmethod
    def _xml_esc(s: str) -> str:
        return (
            str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;")
        )

    def _xml_list_response(self, tag: str, header, rows) -> str:
        """``table_list``/``column_list`` --output_type xml: RESULT
        wrapper, HEADER of PROPERTY name/type pairs, one <TABLE>/<COLUMN>
        element per row; container close tags glue to their last child
        (table_list/multi_tables_xml, column_list/*_xml)."""
        row_tag = tag.rsplit("_", 1)[0]

        def cell(v):
            if v is None:
                return "<NULL/>"
            if isinstance(v, bool):
                return f"<BOOL>{str(v).lower()}</BOOL>"
            if isinstance(v, int):
                return f"<INT>{v}</INT>"
            if isinstance(v, float):
                return f"<FLOAT>{v}</FLOAT>"
            if isinstance(v, list):
                inner = "\n".join(
                    f"<TEXT>{self._xml_esc(x)}</TEXT>" for x in v
                )
                return "<SOURCES>" + ("\n" + inner if v else "") + "</SOURCES>"
            return f"<TEXT>{self._xml_esc(v)}</TEXT>"

        props = "\n".join(
            f"<PROPERTY>\n<TEXT>{n}</TEXT>\n<TEXT>{ty}</TEXT></PROPERTY>"
            for n, ty in header
        )
        body = "\n".join(
            f"<{row_tag}>\n" + "\n".join(cell(v) for v in r) + f"</{row_tag}>"
            for r in rows
        )
        return (
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<RESULT CODE="0" UP="0.0" ELAPSED="0.0">\n'
            f"<{tag}>\n<HEADER>\n{props}</HEADER>\n{body}</{tag}>\n</RESULT>"
        )

    def _xml_resultset(self, n_hits, cols, page, offset: int) -> str:
        """``select --output_type xml``: the SEGMENTS/RESULTSET page.
        Vector fields join with ', '; weight vectors render value:weight
        (select/output/value/weight_vector/type_xml)."""

        def field(v):
            if v is None:
                return ""
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, dict):
                return ", ".join(f"{k}:{w}" for k, w in v.items())
            if isinstance(v, list):
                return ", ".join(field(x) for x in v)
            return self._xml_esc(v)

        hits = []
        for i, row in enumerate(page):
            fields = "\n".join(
                f'<FIELD NAME="{c}">{field(v)}</FIELD>'
                for c, v in zip(cols, row)
            )
            hits.append(f'<HIT NO="{offset + i + 1}">\n{fields}\n</HIT>')
        body = ("\n".join(hits) + "\n") if hits else ""
        return (
            '<?xml version="1.0" encoding="utf-8"?>\n'
            "<SEGMENTS>\n<SEGMENT>\n<RESULTPAGE>\n"
            f'<RESULTSET OFFSET="{offset}" LIMIT="{len(page)}" '
            f'NHITS="{n_hits}">\n{body}</RESULTSET>\n'
            "</RESULTPAGE>\n</SEGMENT>\n</SEGMENTS>"
        )

    # grn fixed-size value types (column_list "type" column: fix/var/index)
    _FIX_TYPES = {
        "Int8", "UInt8", "Int16", "UInt16", "Int32", "UInt32",
        "Int64", "UInt64", "Float", "Time", "Bool",
    }

    def table_list_cmd(self, argv) -> _Resp:
        """``table_list`` (proc.c:2296): every user table, name-ordered —
        [id, name, path, flags|PERSISTENT, domain, range, tokenizer,
        normalizer].  KEY_NORMALIZE surfaces as NormalizerAuto, not as a
        flag (table_list/flags/key_normalize)."""
        _pos, kw = self._kw(argv)
        out_type = kw.get("output_type", "json")
        if out_type not in ("json", "xml"):
            raise Unsupported(f"output_type {out_type}")
        header = [
            ["id", "UInt32"], ["name", "ShortText"], ["path", "ShortText"],
            ["flags", "ShortText"], ["domain", "ShortText"],
            ["range", "ShortText"], ["default_tokenizer", "ShortText"],
            ["normalizer", "ShortText"],
        ]
        rows = []
        for name in sorted(self.tables):
            t = self.tables[name]
            parts = [
                f for f in (t.flags or "TABLE_HASH_KEY").split("|")
                if f and f != "KEY_NORMALIZE"
            ]
            rows.append([
                t.oid, name, self._obj_path(t.oid),
                "|".join(parts) + "|PERSISTENT",
                t.key_gtype if (t.keyed and t.key_declared) else None,
                t.value_type,
                t.tokenizer_raw,
                t.normalizer_raw,
            ])
        if out_type == "xml":
            return _Resp(self._xml_list_response("TABLE_LIST", header, rows))
        return _Resp([header] + rows)

    def column_list_cmd(self, argv) -> _Resp:
        """``column_list`` (proc.c:2157): _key pseudo-column first (id =
        the TABLE's id, empty path), then data/index columns name-ordered."""
        pos, kw = self._kw(argv)
        out_type = kw.get("output_type", "json")
        if out_type not in ("json", "xml"):
            raise Unsupported(f"output_type {out_type}")
        table = self._poskw(pos, kw, 0, "table")
        t = self.tables.get(table or "")
        if t is None:
            return _Resp("ERROR")
        header = [
            ["id", "UInt32"], ["name", "ShortText"], ["path", "ShortText"],
            ["type", "ShortText"], ["flags", "ShortText"],
            ["domain", "ShortText"], ["range", "ShortText"],
            ["source", "ShortText"],
        ]
        rows = []
        if t.keyed:
            rows.append([
                t.oid, "_key", "", "", "COLUMN_SCALAR", table,
                t.key_gtype, [],
            ])
        entries: list[tuple[str, list]] = []
        for name, flags_raw, gtype in t.col_defs:
            kind = "var"
            if "COLUMN_VECTOR" not in flags_raw and (
                gtype in self._FIX_TYPES or gtype in self.tables
            ):
                kind = "fix"
            entries.append((name, [
                t.col_oids.get(name, 0), name,
                self._obj_path(t.col_oids.get(name, 0)), kind,
                flags_raw + "|PERSISTENT", table, gtype, [],
            ]))
        for lex, name, flags_raw, src, sources in self.index_defs:
            if lex != table:
                continue
            srcs = [
                src if c == "_key" else f"{src}.{c}"
                for c in sources.split(",")
            ]
            # canonical grn flag order (db.c grn_column_create_flags):
            # COLUMN_INDEX|WITH_SECTION|WITH_WEIGHT|WITH_POSITION
            given = set(flags_raw.split("|"))
            canon = "|".join(
                f for f in (
                    "COLUMN_INDEX", "WITH_SECTION", "WITH_WEIGHT",
                    "WITH_POSITION",
                ) if f in given
            )
            entries.append((name, [
                t.col_oids.get(name, 0), name,
                self._obj_path(t.col_oids.get(name, 0)), "index",
                canon + "|PERSISTENT", table, src, srcs,
            ]))
        rows += [r for _n, r in sorted(entries)]
        if out_type == "xml":
            return _Resp(self._xml_list_response("COLUMN_LIST", header, rows))
        return _Resp([header] + rows)

    def table_remove_cmd(self, argv) -> _Resp:
        """``table_remove`` (proc.c:1003 / grn_obj_remove): refuses while
        another table references this one (as key type or via a reference
        column); a SELF-reference does not block removal."""
        pos, kw = self._kw(argv)
        name = self._poskw(pos, kw, 0, "name")
        if name not in self.tables:
            return _Resp("ERROR")
        for o, ot in self.tables.items():
            if o == name:
                continue
            if ot.keyed and ot.key_gtype == name:
                return _Resp("ERROR")
            if name in ot.ref_cols.values() or name in ot.vector_ref_cols.values():
                return _Resp("ERROR")
        removed = [d for d in self.index_defs if d[0] == name]
        self.index_defs = [
            d for d in self.index_defs if d[0] != name and d[3] != name
        ]
        for _lex, _n, _f, src, sources in removed:
            st = self.tables.get(src)
            if st is not None and st is not self.tables[name]:
                gone = set(sources.split(","))
                still = {
                    s
                    for d in self.index_defs
                    if d[3] == src
                    for s in d[4].split(",")
                }
                st.indexed_cols = [
                    c for c in st.indexed_cols if c not in (gone - still)
                ]
        del self.tables[name]
        try:
            self.ctx.table_remove(name)
        except Exception:
            pass  # never materialized — nothing on disk
        return _Resp(True)

    def column_remove_cmd(self, argv) -> _Resp:
        pos, kw = self._kw(argv)
        table = self._poskw(pos, kw, 0, "table")
        name = self._poskw(pos, kw, 1, "name")
        t = self.tables.get(table or "")
        if t is None or not name or name == "_key":
            return _Resp("ERROR")
        if name in t.index_cols:
            removed = [
                d for d in self.index_defs if d[0] == table and d[1] == name
            ]
            self.index_defs = [
                d
                for d in self.index_defs
                if not (d[0] == table and d[1] == name)
            ]
            for _lex, _n, _f, src, sources in removed:
                st = self.tables.get(src)
                if st is not None:
                    still = {
                        s
                        for d in self.index_defs
                        if d[3] == src
                        for s in d[4].split(",")
                    }
                    st.indexed_cols = [
                        c for c in st.indexed_cols
                        if c in still or c not in sources.split(",")
                    ]
            del t.index_cols[name]
            t.col_oids.pop(name, None)
            return _Resp(True)
        if name not in t.types and name not in t.col_oids:
            return _Resp("ERROR")
        # removing a data column cascades to index columns sourced from it
        # (grn_obj_remove removes dependent indexes —
        # column_remove/*/with_index)
        for lex, iname, _f, src, sources in list(self.index_defs):
            if src == table and name in sources.split(","):
                lt = self.tables.get(lex)
                if lt is not None:
                    lt.index_cols.pop(iname, None)
                    lt.col_oids.pop(iname, None)
                self.index_defs.remove((lex, iname, _f, src, sources))
        still = {
            s
            for d in self.index_defs
            if d[3] == table
            for s in d[4].split(",")
        }
        t.indexed_cols = [c for c in t.indexed_cols if c != name or c in still]
        t.col_defs = [d for d in t.col_defs if d[0] != name]
        t.columns = [c for c in t.columns if c[0] != name]
        t.types.pop(name, None)
        t.vector_cols.discard(name)
        t.ref_cols.pop(name, None)
        t.vector_ref_cols.pop(name, None)
        t.col_oids.pop(name, None)
        for r in t.rows:
            r.pop(name, None)
        if t.loaded:
            self._resync(table)
        return _Resp(True)

    def column_rename_cmd(self, argv) -> _Resp:
        pos, kw = self._kw(argv)
        table = self._poskw(pos, kw, 0, "table")
        name = self._poskw(pos, kw, 1, "name")
        new = self._poskw(pos, kw, 2, "new_name")
        t = self.tables.get(table or "")
        if t is None or not name or not new:
            return _Resp("ERROR")
        if name in t.index_cols:
            # renaming an INDEX column only touches the schema bookkeeping
            t.index_cols[new] = t.index_cols.pop(name)
            if name in t.col_oids:
                t.col_oids[new] = t.col_oids.pop(name)
            self.index_defs = [
                (lex, new if (lex == table and n == name) else n, f, s, ss)
                for lex, n, f, s, ss in self.index_defs
            ]
            return _Resp(True)
        if name not in t.types:
            return _Resp("ERROR")
        t.col_defs = [
            (new if n == name else n, f, g) for n, f, g in t.col_defs
        ]
        t.columns = [(new if n == name else n, ty) for n, ty in t.columns]
        for d in (t.types, t.ref_cols, t.vector_ref_cols, t.col_oids):
            if name in d:
                d[new] = d.pop(name)
        if name in t.vector_cols:
            t.vector_cols.discard(name)
            t.vector_cols.add(new)
        for r in t.rows:
            if name in r:
                r[new] = r.pop(name)
        if t.loaded:
            self._resync(table)
        return _Resp(True)

    def normalize_cmd(self, argv) -> _Resp:
        """``normalize`` (proc.c:6254): NormalizerAuto with the WITH_TYPES /
        WITH_CHECKS / REMOVE_BLANK / REMOVE_TOKENIZED_DELIMITER flags.
        ``checks`` is per OUTPUT BYTE: the input-byte count consumed at an
        output char's first byte (plus bytes of removed chars pending), 0
        on continuation bytes, -1 on the 2nd+ chars of an expansion."""
        import unicodedata

        pos, kw = self._kw(argv)
        name = self._poskw(pos, kw, 0, "normalizer")
        if not name:
            return _Resp("ERROR")
        string = self._poskw(pos, kw, 1, "string")
        if string is None:
            return _Resp("ERROR")
        flags = self._poskw(pos, kw, 2, "flags", "NONE") or "NONE"
        if name != "NormalizerAuto":
            if name.startswith("Normalizer"):
                raise Unsupported(f"normalizer {name}")
            return _Resp("ERROR")
        remove_blank = "REMOVE_BLANK" in flags
        remove_delim = "REMOVE_TOKENIZED_DELIMITER" in flags
        with_types = "WITH_TYPES" in flags
        with_checks = "WITH_CHECKS" in flags
        out_chars: list[str] = []
        types: list[str] = []
        checks: list[int] = []
        pending = 0  # input bytes of removed chars awaiting attribution
        for ch in string:
            b_in = len(ch.encode("utf-8"))
            if (remove_delim and ch == "￾") or (
                remove_blank and ch.isspace()
            ):
                pending += b_in
                continue
            norm = unicodedata.normalize("NFKC", ch).lower()
            if not norm:
                pending += b_in
                continue
            for j, oc in enumerate(norm):
                out_chars.append(oc)
                if with_types:
                    types.append(_grn_char_type(oc))
                if with_checks:
                    checks.append((b_in + pending) if j == 0 else -1)
                    checks.extend([0] * (len(oc.encode("utf-8")) - 1))
            pending = 0
        return _Resp(
            {"normalized": "".join(out_chars), "types": types, "checks": checks}
        )

    def truncate_cmd(self, argv) -> _Resp:
        """``truncate`` (proc.c:6882): drop all records, keep the schema;
        record ids restart at 1 (the table is emptied)."""
        pos, kw = self._kw(argv)
        table = kw.get("table") or (pos[0] if pos else None)
        if table and "." in table:
            # ``truncate Table.column`` resets that COLUMN's values to the
            # type default, records stay (truncate/column/*)
            table, col = table.split(".", 1)
            t = self.tables.get(table)
            if t is not None and col in t.index_cols:
                # truncating an INDEX column clears its postings; the
                # lexicon keys stay and render 0 (truncate/column/index)
                entry = next(
                    (
                        d for d in self.index_defs
                        if d[0] == table and d[1] == col
                    ),
                    None,
                )
                if entry is None:
                    return _Resp("ERROR")
                src = self.tables.get(entry[3])
                self.trunc_index_ids[(table, col)] = (
                    {r.get("_id") for r in src.rows} if src else set()
                )
                return _Resp(True)
            if t is None or col not in t.types:
                return _Resp("ERROR")
            for r in t.rows:
                r.pop(col, None)
            if t.loaded:
                self._resync(table)
            return _Resp(True)
        t = self.tables.get(table)
        if t is None:
            return _Resp("ERROR")
        t.rows, t.keys, t.next_id = [], [], 1
        if t.loaded:
            self.ctx.truncate(table)
        return _Resp(True)

    def delete_cmd(self, argv) -> _Resp:
        """``delete`` (proc.c:1273) by --key / --id / --filter; the storage
        row mirror is resynced from the table after the anti-join."""
        pos, kw = self._kw(argv)
        table = kw.get("table") or (pos[0] if pos else None)
        t = self.tables.get(table)
        if t is None:
            return _Resp("ERROR")
        if not t.loaded:
            return _Resp("ERROR")
        if "key" in kw:
            key: object = kw["key"]
            if t.key_normalize and isinstance(key, str):
                key = _norm_key(key)
            if t.key_type != "string":
                key = float(key) if t.key_type == "double" else int(key)
            if not any(str(r.get("_key")) == str(key) for r in t.rows):
                return _Resp("ERROR")
            self.ctx.delete(table, key=key, key_col="_key")
        elif "id" in kw:
            if not any(r["_id"] == int(kw["id"]) for r in t.rows):
                return _Resp("ERROR")
            self.ctx.delete(table, key=int(kw["id"]), key_col="_id")
        elif "filter" in kw:
            try:
                self.ctx.delete(table, filter=kw["filter"])
            except _SELECT_ERRORS:
                return _Resp("ERROR")
        else:
            return _Resp("ERROR")
        remaining = {
            r["_id"] for r in self.ctx.dump(table).select("_id").collect()
        }
        gone = [r for r in t.rows if r["_id"] not in remaining]
        t.rows = [r for r in t.rows if r["_id"] in remaining]
        if t.keyed:
            t.keys = [str(r.get("_key", "")) for r in t.rows]
            gone_keys = {str(r.get("_key", "")) for r in gone}
            self._clear_refs(table, gone_keys)
            # deleting a LEXICON record drops the term's postings with it:
            # a later --query for that term finds nothing
            # (delete/index/have_tokenizer)
            for lex, _n, _f, src, _s in self.index_defs:
                if lex == table and gone_keys:
                    self.ctx.delete_terms(src, gone_keys)
        return _Resp(True)

    def dump_cmd(self, argv) -> _Resp:
        """``dump`` (proc.c:6868 grn_dump): the database re-emitted as a
        loadable command stream — schema (tables in creation order with
        their non-reference data columns, KEY_NORMALIZE canonicalized to
        ``--normalizer NormalizerAuto``), then reference columns, then
        per-table ``load`` blocks (lexicons excluded; pat/dat in key
        order), then index columns."""
        pos, kw = self._kw(argv)
        want = {
            part: (kw.get(f"dump_{part}", "yes") != "no")
            for part in ("plugins", "schema", "records", "indexes")
        }
        chunks: list[str] = []
        if want["plugins"] and self.plugins:
            chunks.append(
                "\n".join(f"plugin_register {p}" for p in self.plugins)
            )
        if want["schema"]:
            for name, t in self.tables.items():
                parts = ["table_create", name, t.flags.replace(
                    "|KEY_NORMALIZE", "").replace("KEY_NORMALIZE|", "")]
                if t.keyed:
                    parts.append(t.key_gtype)
                if t.tokenizer_raw:
                    parts += ["--default_tokenizer", t.tokenizer_raw]
                if t.normalizer_raw:
                    parts += ["--normalizer", t.normalizer_raw]
                if t.token_filters:
                    parts += ["--token_filters", ",".join(t.token_filters)]
                lines = [" ".join(parts)]
                for cn, cf, cg in sorted(t.col_defs):
                    if cn in t.ref_cols or cn in t.vector_ref_cols:
                        continue  # reference columns dump after all tables
                    lines.append(f"column_create {name} {cn} {cf} {cg}")
                chunks.append("\n".join(lines))
            ref_lines = []
            for name, t in self.tables.items():
                for cn, cf, cg in sorted(t.col_defs):
                    if cn in t.ref_cols or cn in t.vector_ref_cols:
                        ref_lines.append(
                            f"column_create {name} {cn} {cf} {cg}"
                        )
            if ref_lines:
                chunks.append("\n".join(ref_lines))
        if want["records"]:
            for name, t in self.tables.items():
                # a lexicon's records reconstruct from reindex — dump
                # skips a tokenizer lexicon, and an untokenized index
                # lexicon whose every key was auto-registered, UNLESS it
                # carries data columns (dump/record/lexicon vs
                # …/table_tokenizer_index_column; table_create/normalizer/
                # auto/utf8 dumps no Terms records)
                auto_only = t.index_cols and all(
                    r.get("__auto__") for r in t.rows
                )
                if (
                    (t.lex_tokenizer is not None or auto_only)
                    and not t.col_defs
                ) or not t.rows:
                    continue
                cols = (["_key"] if t.keyed else ["_id"]) + sorted(
                    cn for cn, _, _ in t.col_defs
                )
                rows = t.rows
                if t.keyed and (t.pat or t.dat):
                    rows = sorted(rows, key=lambda r: str(r.get("_key", "")))
                else:
                    rows = sorted(rows, key=lambda r: r["_id"])
                dflt = {"string": "", "long": 0, "double": 0.0,
                        "boolean": False}

                def cell(r, cn):
                    if cn == "_id":
                        return r["_id"]
                    if cn == "_key":
                        v = r.get("_key", "")
                        if t.key_type != "string" and not isinstance(
                            v, (int, float)
                        ):
                            return int(v) if t.key_type == "long" else float(v)
                        return v
                    v = r.get(cn)
                    if v is None:
                        ty = dict(t.columns).get(cn, "string")
                        if ty.startswith("array"):
                            return []
                        return dflt.get(ty, "")
                    if isinstance(v, dict):
                        # weight vector dumps as one {value: weight}
                        # object per element (dump/record/weight_vector_*)
                        return [{k: w} for k, w in v.items()]
                    return v

                body = [json.dumps(cols, ensure_ascii=False,
                                   separators=(",", ":"))]
                for r in rows:
                    body.append(json.dumps(
                        [cell(r, cn) for cn in cols],
                        ensure_ascii=False, separators=(",", ":"),
                    ))
                chunks.append(
                    f"load --table {name}\n[\n" + ",\n".join(body) + "\n]"
                )
        if want["indexes"]:
            def canon(fl: str) -> str:
                given = set(fl.split("|"))
                return "|".join(
                    f for f in (
                        "COLUMN_INDEX", "WITH_SECTION", "WITH_WEIGHT",
                        "WITH_POSITION",
                    ) if f in given
                )

            idx_lines = [
                f"column_create {lx} {nm} {canon(fl)} {st} {src}"
                for lx, nm, fl, st, src in self.index_defs
            ]
            if idx_lines:
                chunks.append("\n".join(idx_lines))
        return _Resp("\n\n".join(chunks))

    def cache_limit_cmd(self, argv) -> _Resp:
        pos, kw = self._kw(argv)
        v = kw.get("max") or (pos[0] if pos else None)
        try:
            return _Resp(self.ctx.cache_limit(int(v) if v is not None else None))
        except ValueError:
            return _Resp("ERROR")

    def range_filter_cmd(self, argv) -> _Resp:
        """``range_filter`` (proc.c range_filter): ordered slice over a
        column's value range — borders default to include; output rows ride
        value-then-id order with per-column type names in the header."""
        pos, kw = self._kw(argv)
        table = kw.get("table") or pos[0]
        column = kw.get("column") or pos[1]
        if table not in self.tables:
            return _Resp("ERROR")
        t = self.tables[table]
        if not t.loaded:
            self._ingest(table, [])
        gtype = t.types.get(column, "UInt32" if column == "_id" else "ShortText")

        def lit(v: str) -> str:
            if gtype == "Time":
                return repr(_parse_time(v))
            if gtype in _INT_WIDTH or gtype == "Float":
                return v
            return json.dumps(v)

        conds = []
        if "min" in kw:
            op = ">=" if kw.get("min_border", "include") == "include" else ">"
            conds.append(f"{column} {op} {lit(kw['min'])}")
        if "max" in kw:
            op = "<=" if kw.get("max_border", "include") == "include" else "<"
            conds.append(f"{column} {op} {lit(kw['max'])}")
        if kw.get("filter"):
            conds.append(f"({kw['filter']})")
        out_default = ["_id"] + (["_key"] if t.keyed else []) + [
            n for n, _ in t.columns if n not in t.vector_cols
        ]
        out_cols = [
            c.strip()
            for c in kw.get("output_columns", ",".join(out_default)).split(",")
        ]
        # offset/limit validate against the match size with EXPLICIT
        # errors, unlike select's silent clamp (proc.c range_filter:
        # "too small/large offset", "too small limit", "invalid … format";
        # the default limit is 10 — range_filter/limit/default)
        try:
            offset = int(kw.get("offset", 0))
            limit = int(kw.get("limit", 10))
        except ValueError:
            return _Resp("ERROR")
        res = self.ctx.select(
            table,
            filter=" && ".join(conds) or None,
            sortby=f"{column},_id" if column in [n for n, _ in t.columns] else "_id",
            offset=0,
            limit=-1,
            output_columns=",".join(out_cols),
            id_col="_id",
        )
        size = res["n_hits"]
        if offset < 0:
            offset += size
            if offset < 0:
                return _Resp("ERROR")
        elif offset > size:
            return _Resp("ERROR")
        if limit < 0:
            limit += size + 1
            if limit < 0:
                return _Resp("ERROR")
        header = [
            [c, {"_id": "UInt32", "_key": t.key_gtype, "_score": "Int32"}.get(
                c, t.types.get(c, "ShortText")
            )]
            for c in out_cols
        ]
        rows = [
            [self._out_val(r[self._col_name(c)]) for c in out_cols]
            for r in res["records"].collect()
        ][offset : offset + limit]
        return _Resp([header] + rows)


def run_fixture(spark, db_path: str, test_text: str, expected_text: str):
    """Replay one ``.test``; → list of (command, ours, theirs, match)."""
    import shutil

    # a reused db_path (sweep reruns) must start empty — stale parquet from
    # an earlier fixture would merge into same-named tables
    shutil.rmtree(db_path, ignore_errors=True)
    runner = ConformanceRunner(spark, db_path)
    got = runner.run(test_text)
    exp = parse_expected(
        expected_text, [raw for raw, _, _ in parse_script(test_text)]
    )
    # both sides key on (whitespace-normalized command, occurrence #)
    results = []
    for key, ours in got.items():
        cmd = key[0]
        resp = exp.get(key)
        if resp is None:
            # included-fixture / #@disable-logging commands run for state
            # but have no recorded response to verify against
            continue
        if isinstance(ours, _Resp):
            if isinstance(resp, tuple) and resp and resp[0] == "#text":
                mcb = re.search(r"[?&]callback=(\w+)", cmd)
                mtx = re.match(
                    r"(\w+)\((.*)\);\s*$", resp[1].strip(), re.DOTALL
                )
                if mcb and mtx and mcb.group(1) == mtx.group(1):
                    # jsonp-wrapped non-select (or errored) response:
                    # unwrap and compare the inner rc/body
                    try:
                        inner = json.loads(mtx.group(2))
                    except ValueError:
                        inner = None
                    if inner is not None:
                        rc_ok = inner[0][0] == 0
                        if ours.body == "ERROR":
                            ok = not rc_ok
                        else:
                            ok = rc_ok and ours.body == (
                                inner[1] if len(inner) > 1 else True
                            )
                        results.append((cmd, ours.body, inner, ok))
                        continue
                # raw-text response (dump): compare normalized text
                theirs = resp[1]
                ok = isinstance(ours.body, str) and ours.body.strip() == theirs.strip()
            else:
                rc_ok = resp[0][0] == 0  # error rc rides as [-n,…] or nested
                theirs = resp[1] if len(resp) > 1 else True
                if ours.body == "ERROR":
                    ok = not rc_ok
                    theirs = resp if not rc_ok else theirs
                else:
                    ok = rc_ok and ours.body == theirs
            results.append((cmd, ours.body, theirs, ok))
            continue
        if isinstance(resp, tuple) and resp and resp[0] == "#text":
            # jsonp: the recorded body is `callback(<response>);` — check
            # the wrapper uses OUR parsed callback name, then compare the
            # inner response structurally (response/jsonp)
            mcb = re.search(r"[?&]callback=(\w+)", cmd)
            mtx = re.match(
                r"(\w+)\((.*)\);\s*$", resp[1].strip(), re.DOTALL
            )
            if mcb and mtx and mcb.group(1) == mtx.group(1):
                try:
                    inner = json.loads(mtx.group(2))
                except ValueError:
                    inner = None
                if inner is not None:
                    theirs = select_result(inner)
                    results.append((cmd, ours, theirs, ours == theirs))
                    continue
            results.append((cmd, ours, resp[1], False))
            continue
        theirs = select_result(resp)
        results.append((cmd, ours, theirs, ours == theirs))
    return results
