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
    key_normalize: bool = False  # KEY_NORMALIZE flag / --normalizer
    loaded: bool = False  # a parquet snapshot exists (possibly empty)

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


def parse_script(text: str) -> list[tuple[str, list[str], str | None]]:
    """``.test`` text → [(raw_command_line, argv, payload_json|None)].

    grntest directives (``#@…``, ``#$…``) and comments are skipped; a
    ``load`` command consumes the following bracket-balanced JSON block
    as its payload.
    """
    out = []
    lines = _join_continuations(text).splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        i += 1
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        if not _CMD_RE.match(line):
            raise Unsupported(f"unparseable line {line!r}")
        argv = unesc_tokens(line)
        payload = None
        if argv[0] == "load":
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


def parse_expected(text: str) -> dict[str, object]:
    """``.expected`` text → {command_line: parsed JSON response}.

    Responses follow their echoed command; a load's input JSON is echoed
    too, so the response of ``load`` is the LAST json line before the
    next command.  Multi-line (pretty-printed) responses are joined.
    """
    lines = _join_continuations(text).splitlines()
    # indices of echoed command lines
    cmd_idx = [k for k, l in enumerate(lines) if _CMD_RE.match(l)]
    res: dict[str, object] = {}
    for j, k in enumerate(cmd_idx):
        end = cmd_idx[j + 1] if j + 1 < len(cmd_idx) else len(lines)
        # grntest log annotations (#|e| error echo, #>/#< traces) ride
        # between responses — drop them before JSON-parsing
        chunk = [l for l in lines[k + 1 : end] if not l.lstrip().startswith("#")]
        if not chunk:
            continue
        cmd = lines[k].rstrip()
        if cmd.startswith("load"):
            res[cmd] = json.loads(chunk[-1])
        else:
            # raw_decode: take the first JSON document; multi-line #|e|
            # error annotations continue past their '#' line and would
            # otherwise corrupt the parse
            res[cmd] = json.JSONDecoder().raw_decode("\n".join(chunk))[0]
    return res


def select_result(response):
    """Parsed select response → [(n_hits, column names, rows), …] — one
    tuple per result table (main result, then one per drilldown) — or the
    sentinel ``("ERROR",)`` when the reference reported a non-zero rc
    (e.g. -63 syntax error — suite/select/query/invalid/*)."""
    if response[0][0] != 0:
        return ("ERROR",)
    tables = []
    for body in response[1]:
        n_hits = body[0][0]
        cols = [c[0] for c in body[1]]
        tables.append((n_hits, cols, body[2:]))
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
        r'\s*("(?:\\.|[^"])*"|\d+\.\d+|\d+|[A-Za-z_][\w.]*|'
        r"\|\||&&|>>>|<<|>>|[!=<>]=|[-+*/%&|^<>()!])"
    )

    def __init__(self, expr: str, types: dict):
        self.toks = self._TOK.findall(expr)
        self.types = types  # column → groonga type name
        # output column name: a leading column ref names the column,
        # anything else is anonymous ("" in the reference output)
        self.name = (
            self.toks[0]
            if self.toks and self.toks[0] in types or
               (self.toks and self.toks[0].split(".")[0] in types)
            else ""
        )
        self.cols = [
            tk.split(".")[0] for tk in self.toks if tk.split(".")[0] in types
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
        if tk.startswith('"'):
            return json.loads(tk)
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

    # -- command handlers --------------------------------------------------
    def _kw(self, argv: list[str]) -> tuple[list[str], dict[str, str]]:
        pos, kw = [], {}
        k = 1
        while k < len(argv):
            if argv[k].startswith("--"):
                kw[argv[k][2:]] = argv[k + 1]
                k += 2
            else:
                pos.append(argv[k])
                k += 1
        return pos, kw

    def table_create(self, argv):
        pos, kw = self._kw(argv)
        name, flags = pos[0], pos[1] if len(pos) > 1 else "TABLE_HASH_KEY"
        t = _Table(keyed="NO_KEY" not in flags, flags=flags)
        t.key_normalize = "KEY_NORMALIZE" in flags or "normalizer" in kw
        if "default_tokenizer" in kw:
            tok = TOKENIZER_MAP.get(kw["default_tokenizer"])
            if tok is None:
                raise Unsupported(f"tokenizer {kw['default_tokenizer']}")
            t.lex_tokenizer = tok
        if t.keyed and len(pos) > 2:
            kt = TYPE_MAP.get(pos[2])
            if kt is None:
                raise Unsupported(f"key type {pos[2]}")
            t.key_type = kt
        self.tables[name] = t

    def column_create(self, argv):
        pos, kw = self._kw(argv)
        table, name, flags = pos[0], pos[1], pos[2]
        if "COLUMN_INDEX" in flags:
            # column_create Lexicon idx COLUMN_INDEX|… SourceTable col[,col]
            lex = self.tables[table]
            src_table, sources = pos[3], (kw.get("source") or pos[4]).split(",")
            t = self.tables[src_table]
            t.indexed_cols.extend(s for s in sources if s not in t.indexed_cols)
            # a lexicon with no --default_tokenizer indexes WHOLE values
            # (one key per value; suffix_search/…_index_with_sis.test,
            # escape/prefix_search.test) — TokenDelimitNull on \0-free text
            # is exactly that: the full normalized value as a single token
            t.tokenizer = lex.lex_tokenizer or "delimit_null"
            t.untok_index = lex.lex_tokenizer is None
            t.lex_sis = lex.sis
            return
        if self.tables[table].lex_tokenizer is not None:
            return  # lexicon data columns are index internals
        t = self.tables[table]
        gtype = pos[3] if len(pos) > 3 else "ShortText"
        typ = TYPE_MAP.get(gtype)
        if typ is None and gtype in self.tables and self.tables[gtype].keyed:
            # reference column: stored as a struct of the referenced
            # record's _key + scalar columns so that script dotted access
            # (bookmark.title) compiles to Spark struct field access
            if "COLUMN_VECTOR" in flags:
                # vector of references (tag column): an array of the
                # referenced keys; match ops evaluate per element
                ref = self.tables[gtype]
                t.columns.append((name, f"array<{ref.key_type}>"))
                t.types[name] = gtype
                t.vector_cols.add(name)
                t.vector_ref_cols[name] = gtype
                return
            ref = self.tables[gtype]
            parts = [f"_key:{ref.key_type}"] + [
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
        else:
            t.columns.append((name, typ))

    def load(self, argv, payload):
        pos, kw = self._kw(argv)
        table = kw["table"]
        rows = json.loads(payload)
        # columns-as-first-row form: [["a","b"],[1,2],...] — the header is
        # a non-empty list of names; a bare [] is ONE record with all
        # defaults (suite/select/filter/no_index/score/*)
        if rows and isinstance(rows[0], list):
            if rows[0] and all(isinstance(x, str) for x in rows[0]):
                header = rows[0]
                rows = [dict(zip(header, r)) for r in rows[1:]]
            elif all(r == [] for r in rows):
                rows = [{} for _ in rows]
            else:
                raise Unsupported("positional load rows without a header")
        return self._ingest(table, rows)

    def _ref_struct(self, ref: "_Table", key) -> dict:
        """Struct value of a reference column pointing at ``key``: the
        referenced record's _key plus its scalar columns (dotted access
        ``refcol.attr`` then works as Spark struct field access)."""
        if ref.key_normalize and isinstance(key, str):
            key = _norm_key(key)
        rec = next(
            (r for r in ref.rows if str(r.get("_key", "")) == str(key)), {}
        )
        out = {"_key": key}
        for n, _ty in ref.columns:
            if n not in ref.ref_cols:
                out[n] = rec.get(n)
        return out

    def _ingest(self, table: str, rows: list[dict]) -> int:
        t = self.tables[table]
        if t.keyed and t.key_normalize and t.key_type == "string":
            # the key trie stores NORMALIZED keys (KEY_NORMALIZE /
            # --normalizer NormalizerAuto) — selects output them normalized
            for r in rows:
                if "_key" in r:
                    r["_key"] = _norm_key(str(r["_key"]))
        time_cols = [n for n, ty in t.columns if t.types.get(n) == "Time"]
        for r in rows:
            for n in t.vector_cols:
                if isinstance(r.get(n), dict):
                    raise Unsupported("weighted vector value")
            for n in time_cols:
                if isinstance(r.get(n), str):
                    r[n] = _parse_time(r[n])
            for v in r.values():
                if isinstance(v, int) and not -(1 << 63) <= v < (1 << 63):
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
                    expanded.append(r if k == str(r["_key"]) else {"_key": k})
            rows = expanded
        for r in rows:
            # vector-of-reference elements auto-register too, normalized
            # per the referenced table's key rules
            for col, ref_name in t.vector_ref_cols.items():
                vals = r.get(col) or []
                ref = self.tables[ref_name]
                if ref.key_normalize:
                    vals = [
                        _norm_key(v) if isinstance(v, str) else v for v in vals
                    ]
                    r[col] = vals
                known = {str(x.get("_key", "")) for x in ref.rows}
                for key in vals:
                    if key not in (None, "") and str(key) not in known:
                        self._ingest(ref_name, [{"_key": key}])
                        known.add(str(key))
            # loading an unknown key into a reference column auto-adds it
            # to the referenced table (grn table key auto-registration)
            for col, ref_name in t.ref_cols.items():
                key = r.get(col)
                if key in (None, ""):
                    continue
                ref = self.tables[ref_name]
                if ref.key_normalize and isinstance(key, str):
                    key = _norm_key(key)
                if str(key) not in {str(x.get("_key", "")) for x in ref.rows}:
                    self._ingest(ref_name, [{"_key": key}])
        for r in rows:
            r["_id"] = t.next_id
            t.next_id += 1
            if t.keyed:
                t.keys.append(str(r.get("_key", "")))
        t.rows.extend(rows)
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
        df = self.spark.createDataFrame(data, ", ".join(schema_parts))
        self.ctx.load(table, df, key_col="_id")
        t.loaded = True
        return len(rows)

    def select(self, argv):
        pos, kw = self._kw(argv)
        table = kw.pop("table", None) or pos[0]
        if table not in self.tables:
            raise Unsupported(f"select on unknown table {table}")
        t = self.tables[table]
        if t.lex_tokenizer is not None:
            # selecting a lexicon table exposes index internals (term ids,
            # index-column byte estimates) we don't materialize
            raise Unsupported("select on a lexicon table")
        if not t.loaded:
            self._ingest(table, [])  # selects on never-loaded tables
        out_default = ["_id"] + (["_key"] if t.keyed else []) + [
            n for n, _ in t.columns if n not in t.vector_cols
        ] + [n for n in t.vector_cols]
        query = kw.pop("query", None)
        match_cols = kw.pop("match_columns", None)
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
        args: dict = dict(
            query=query,
            filter=kw.pop("filter", None),
            match_columns=match_cols,
            output_columns=kw.pop("output_columns", ",".join(out_default)),
            sortby=explicit_sort or "_id",
            offset=offset,
            limit=limit,
            id_col="_id",
            scorer="tf",
            columns=columns or None,
        )
        # _key ops always scan: the reference resolves _key:^ / _key:$ via
        # the key trie (key prefix/suffix search), never the fulltext
        # lexicon — our endswith/startswith scan reproduces those results
        key_scan = ["_key"] if t.keyed and t.key_type == "string" else []
        if t.vector_cols:
            # vector (tag) columns: match ops evaluate per element; an
            # index over the vector makes `@` an exact element lookup
            args["array_match"] = {
                n: n in t.indexed_cols for n in t.vector_cols
            }
        scalar_indexed = [c for c in t.indexed_cols if c not in t.vector_cols]
        if query is not None and t.indexed_cols and not scalar_indexed:
            raise Unsupported("--query over a vector index")
        if scalar_indexed:
            args["text_cols"] = scalar_indexed
            args["tokenizer"] = t.tokenizer
            args["scan_columns"] = key_scan
        else:
            # no COLUMN_INDEX anywhere → every query-syntax column op
            # scans, as the reference does without an index
            strings = [n for n, ty in t.columns if ty == "string"]
            args["text_cols"] = strings or key_scan
            args["tokenizer"] = "bigram"
            args["scan_columns"] = strings + key_scan
        if "query_flags" in kw:
            args["query_flags"] = kw.pop("query_flags")
        if "match_escalation_threshold" in kw:
            args["match_escalation_threshold"] = int(
                kw.pop("match_escalation_threshold")
            )
        kw.pop("cache", None)
        if kw.pop("command_version", "1") not in ("1", "2"):
            raise Unsupported("command_version 3 (object output)")
        if kw:
            raise Unsupported(f"select args {sorted(kw)}")
        if args["filter"]:
            f = args["filter"]
            if any(t.types.get(n) == "Time" for n, _ in t.columns):
                # Time comparisons coerce datetime string literals
                # (suite/select/filter/no_index/time/*) — grntest runs in
                # JST, see _parse_time
                f = _TIME_LIT_RE.sub(lambda m: repr(_parse_time(m.group(1))), f)
            for col in t.ref_cols:
                # a reference column used as a VALUE (not dotted) means
                # its key text (match/prefix ops on reference columns)
                f = re.sub(rf"\b{re.escape(col)}\b(?!\s*\.)", f"{col}._key", f)
            args["filter"] = f

        rank = None if explicit_sort else self._natural_rank(t, args)
        entries = [c.strip() for c in args["output_columns"].split(",")]
        ident = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
        exprs: dict[str, _OutExpr] = {}
        fetch: list[str] = []
        for e in entries:
            if ident.fullmatch(e):
                if e not in fetch:
                    fetch.append(e)
            else:
                x = _OutExpr(e, t.types)
                exprs[e] = x
                for c in x.cols:
                    if c not in fetch:
                        fetch.append(c)
        if "_id" not in fetch and (rank is not None or not fetch):
            fetch.append("_id")
        args["output_columns"] = ",".join(fetch)
        if rank is not None:
            # storage-order output (pat/dat cursor order, SIS walk order):
            # fetch the FULL match set id-ordered, present it in the
            # table's natural order, page here.  Matching stays entirely
            # engine-side; only the row ORDER is a storage-layout artifact
            # the runner reproduces from its key mirror.
            args["offset"], args["limit"] = 0, -1
        res = self.ctx.select(table, **args)
        rows = res["records"].collect()
        n_hits = res["n_hits"]
        if rank is not None:
            rows = sorted(rows, key=lambda r: rank.get(r["_id"], 1 << 60))
            off = offset if offset >= 0 else max(n_hits + offset, 0)
            lim = limit if limit >= 0 else max(n_hits + limit + 1 - off, 0)
            rows = rows[off : off + lim]
        page = []
        for row in rows:
            vals = []
            for e in entries:
                if e in exprs:
                    d = row.asDict()
                    if "score" in d:
                        d["_score"] = d["score"]
                    vals.append(self._out_val(exprs[e].eval(d)))
                else:
                    vals.append(self._out_val(row[self._col_name(e)]))
            page.append(vals)
        cols_out = [exprs[e].name if e in exprs else e for e in entries]
        return [(n_hits, cols_out, page)]

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

        scalar_indexed = [c for c in t.indexed_cols if c not in t.vector_cols]
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
        # Groonga serializes integral floats as ints for _score
        if isinstance(v, float) and v.is_integer():
            return int(v)
        if hasattr(v, "__fields__"):  # Row = reference column → its key
            return v["_key"]
        return v

    def run(self, script_text: str) -> dict[str, tuple]:
        """Execute a script; → {select_command_line: (n_hits, cols, rows)}."""
        out = {}
        for raw, argv, payload in parse_script(script_text):
            name = argv[0]
            if name == "table_create":
                self.table_create(argv)
            elif name == "column_create":
                self.column_create(argv)
            elif name == "load":
                self.load(argv, payload)
            elif name == "select":
                try:
                    out[raw] = self.select(argv)
                except _SELECT_ERRORS:
                    # reference answers malformed queries/filters with an
                    # error response (rc<0), not a crash — match
                    # kind-for-kind (an unexpected error still FAILS the
                    # compare unless the reference errored too)
                    out[raw] = ("ERROR",)
            else:
                raise Unsupported(f"command {name}")
        return out


def run_fixture(spark, db_path: str, test_text: str, expected_text: str):
    """Replay one ``.test``; → list of (command, ours, theirs, match)."""
    runner = ConformanceRunner(spark, db_path)
    got = runner.run(test_text)
    exp = parse_expected(expected_text)
    # the .expected echo preserves the original continuation spacing,
    # parse_script collapses it — compare on normalized whitespace
    norm = {re.sub(r"\s+", " ", k): v for k, v in exp.items()}
    results = []
    for cmd, ours in got.items():
        theirs = select_result(norm[re.sub(r"\s+", " ", cmd)])
        results.append((cmd, ours, theirs, ours == theirs))
    return results
