"""Script-syntax (``--filter``) expression compiler.

Groonga compiles its ECMAScript-like filter syntax with a lemon grammar
(reference ``lib/grn_ecmascript.lemon``; ``grn_expr_parse`` lib/expr.c:6646)
into a stack-VM program executed per record (``grn_expr_exec``
lib/expr.c:2330).  The Spark re-expression needs no VM: the same grammar
compiles directly to a Catalyst ``Column`` expression tree, which Spark
whole-stage-codegens JVM-side — the filter is evaluated inside the scan,
with predicate pushdown to parquet where the expression allows it.

Supported (the operator set of §2.2/§2.8):

* literals: decimal/float numbers, ``"str"`` / ``'str'``, true/false/null
* column references, including dotted paths (``a.b`` → struct field or
  pre-joined reference column)
* comparisons ``== != < > <= >=`` with Spark's type coercion
* logical ``&& || !``
* arithmetic ``+ - * / %`` and unary ``-``
* bitwise ``& | ^ ~ << >>`` (``>>>`` maps to ``shiftrightunsigned``)
* match operators (scan fallback semantics, lib/operator.c:904-930):
  ``col @ "sub"`` substring, ``col @^ "pfx"`` prefix, ``col @$ "sfx"``
  suffix, ``col @~ "re"`` regexp (Onigmo → Java regex)
* registered scalar functions (lib/proc.c:6910+): ``edit_distance``,
  ``between``, ``in_values``, ``all_records``, ``vector_size``,
  ``html_untag``, ``now``, ``rand``, ``max``, ``min`` (varargs scalar →
  greatest/least)
* plan-level selector functions via :func:`parse_filter_plan`:
  ``sub_filter(ref_col, "expr")`` (func_sub_filter, lib/proc.c:5269) and
  ``query("cols", "q")`` (func_query, lib/proc.c:5138).  These cannot be
  Column expressions — each compiles to a distributed membership semi-join
  whose boolean flag substitutes into the surrounding expression, so
  arbitrary boolean nesting (``!sub_filter(...) || x > 3``) stays correct
  and fully distributed (no driver-side id collection).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import functions as gf

_TOKEN_RE = re.compile(
    r"""
    \s*(
        @\^ | @\$ | @~ | @ |
        \*[NST]\b |
        && | &! | \|\| | == | != | <= | >= | << | >>> | >> |
        [()!<>,+\-*/%&|^~\[\].] |
        "(?:[^"\\]|\\.)*" | '(?:[^'\\]|\\.)*' |
        \d+\.\d+ | \d+ |
        [A-Za-z_][A-Za-z0-9_.]*
    )""",
    re.VERBOSE,
)


class ScriptSyntaxError(ValueError):
    pass


class _Scored:
    """A boolean subexpression paired with its score contribution —
    the scored compile mode's value type (see :func:`parse_filter_scored`).
    In any non-logical context it degrades to its condition."""

    __slots__ = ("cond", "score")

    def __init__(self, cond: Column, score: Column):
        self.cond = cond
        self.score = score


class _Arr:
    """A reference to an array (COLUMN_VECTOR) column; match operators
    evaluate per element.  ``exact`` marks a tag-index-backed column whose
    ``@`` is an exact element lookup."""

    __slots__ = ("col", "exact")

    def __init__(self, col: Column, exact: bool):
        self.col = col
        self.exact = exact


class _Geo:
    """A reference to a geo-point column (canonical ``"latxlng"`` msec
    string, see :mod:`groonga_spark.geo`); carries the point's datum so
    geo_distance()'s ellipsoid constants follow the column type."""

    __slots__ = ("col", "domain")

    def __init__(self, col: Column, domain: str):
        self.col = col
        self.domain = domain


class _GrnBool:
    """A Groonga-boolean function result usable BOTH as a filter condition
    and as a number (``geo_in_rectangle(...) > 0`` — grn bools compare as
    1/0; Spark won't compare boolean with int)."""

    __slots__ = ("cond",)

    def __init__(self, cond: Column):
        self.cond = cond


def _c(x) -> Column:
    """Lift a raw python literal to a Column; pass Columns through."""
    if isinstance(x, _Scored):
        return x.cond
    if isinstance(x, _Arr):
        return x.col
    if isinstance(x, _Geo):
        return x.col
    if isinstance(x, _GrnBool):
        # numeric context: grn bool is 1/0 (geo_in_*(…) > 0)
        return x.cond.cast("int")
    return x if isinstance(x, Column) else F.lit(x)


def _cond(x) -> Column:
    # a bare vector in a logical position is ALWAYS truthy, empty or not
    # (suite/select/filter/vector/{and,or}: 'tags && true' matches the
    # no-tag record too)
    if isinstance(x, _Arr):
        return F.lit(True)
    if isinstance(x, _GrnBool):
        return x.cond
    return _c(x)


def _score_of(x, cond: Column) -> Column:
    """Score contribution of a logical operand: an atom tree carries its
    own score; a bare boolean (e.g. a literal or function call) scores 1
    when satisfied."""
    return x.score if isinstance(x, _Scored) else F.lit(1.0)


def _tokenize(src: str) -> list[str]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            if src[i:].strip() == "":
                break
            raise ScriptSyntaxError(f"bad token at {src[i:]!r}")
        out.append(m.group(1))
        i = m.end()
    return out


def _lit(tok: str):
    if tok[0] in "\"'":
        body = tok[1:-1]
        return re.sub(r"\\(.)", r"\1", body)
    if re.fullmatch(r"\d+\.\d+", tok):
        return float(tok)
    if re.fullmatch(r"\d+", tok):
        return int(tok)
    return None


# plugin-added scalar functions (grn_proc_create from a loaded plugin —
# plugins/*/…; registered via commands.plugin_register → register_function)
_EXTRA_FNS: dict = {}


def register_function(name: str, fn) -> None:
    """Add ``name`` to the ``--filter`` script-function registry.  ``fn``
    receives the parsed argument atoms (column-name strings / literals —
    lift with :func:`lift`) and returns a Column."""
    _EXTRA_FNS[name] = fn


def unregister_function(name: str) -> None:
    _EXTRA_FNS.pop(name, None)


def lift(atom):
    """Public lift: parsed script atom (column name / literal) → Column —
    for plugin-registered functions."""
    return _c(atom)


def _geo_pt(a, name):
    """Literal arg → (lat, lng) msec; parse errors surface as script
    errors (the reference select answers rc<0 on a bad cast)."""
    from .. import geo as _geo

    if isinstance(a, str):
        try:
            return _geo.parse_geopoint(a)
        except _geo.GeoParseError as e:
            raise ScriptSyntaxError(str(e))
    raise ScriptSyntaxError(f"{name} expects a geo point literal")


def _geo_latlng(a):
    """Column-ish arg → (lat Column, lng Column, domain) or None."""
    from .. import geo as _geo

    if isinstance(a, _Geo):
        lat, lng = _geo.lat_lng(a.col)
        return lat, lng, a.domain
    if isinstance(a, Column):
        lat, lng = _geo.lat_lng(a)
        return lat, lng, "wgs84"
    return None


def _geo_call(name, *args):
    """geo_distance / geo_in_circle / geo_in_rectangle
    (lib/geo.c:2083-2570, proc registrations proc.c:7036-7052)."""
    from .. import geo as _geo

    def approx_of(a):
        ap = _geo.APPROX_NAMES.get(a if isinstance(a, str) else None)
        if ap is None:
            raise ScriptSyntaxError(
                f"geo distance approximate type must be one of "
                f"[rectangle, rect, sphere, sphr, ellipsoid, ellip]: {a!r}"
            )
        return ap

    if name == "geo_distance":
        if not 2 <= len(args) <= 3:
            raise ScriptSyntaxError("geo_distance takes 2 or 3 arguments")
        approx = approx_of(args[2]) if len(args) == 3 else "rectangle"
        c = _geo_latlng(args[0])
        if c is not None:
            lat, lng, domain = c
            return _geo.distance_col(
                lat, lng, _geo_pt(args[1], name), approx, domain
            )
        return F.lit(_geo.distance_py(
            _geo_pt(args[0], name), _geo_pt(args[1], name), approx
        ))
    if name == "geo_in_rectangle":
        if len(args) != 3:
            raise ScriptSyntaxError("geo_in_rectangle takes 3 arguments")
        tl, br = _geo_pt(args[1], name), _geo_pt(args[2], name)
        c = _geo_latlng(args[0])
        if c is None:
            p = _geo_pt(args[0], name)
            return _GrnBool(F.lit(_geo.in_rectangle_py(p, tl, br)))
        lat, lng, _dom = c
        return _GrnBool(_geo.in_rectangle_col(lat, lng, tl, br))
    # geo_in_circle(point, center, radius_or_point[, approx])
    if not 3 <= len(args) <= 4:
        raise ScriptSyntaxError("geo_in_circle takes 3 or 4 arguments")
    approx = approx_of(args[3]) if len(args) == 4 else "rectangle"
    center = _geo_pt(args[1], name)
    radius = args[2]
    if isinstance(radius, str):
        radius = _geo_pt(radius, name)
    elif not isinstance(radius, (int, float)) or isinstance(radius, bool):
        raise ScriptSyntaxError("geo_in_circle radius must be a literal")
    c = _geo_latlng(args[0])
    if c is None:
        p = _geo_pt(args[0], name)
        return _GrnBool(F.lit(_geo.in_circle_py(p, center, radius, approx)))
    lat, lng, domain = c
    return _GrnBool(_geo.in_circle_col(lat, lng, center, radius, approx, domain))


# registered scalar functions (lib/proc.c:6910-7000 registry analogue)
def _fn_registry():
    return {
        **_EXTRA_FNS,
        "geo_distance": lambda *a: _geo_call("geo_distance", *a),
        "geo_in_circle": lambda *a: _geo_call("geo_in_circle", *a),
        "geo_in_rectangle": lambda *a: _geo_call("geo_in_rectangle", *a),
        # between's borders and in_values' value list need RAW python
        # values; everything else lifts its args to Columns
        "edit_distance": lambda a, b: gf.edit_distance(_c(a), _c(b)),
        "between": lambda col, lo, lob, hi, hib: gf.between(_c(col), lo, lob, hi, hib),
        "in_values": lambda col, *vs: gf.in_values(_c(col), *vs),
        "all_records": lambda: gf.all_records(),
        "vector_size": lambda c: gf.vector_size(_c(c)),
        "html_untag": lambda c: gf.html_untag(_c(c)),
        "now": lambda: F.current_timestamp(),
        "rand": lambda *a: (F.rand() * a[0]) if a else F.rand(),
        # grn max()/min() accept any arity: 0 args → 0, 1 arg → itself
        # (suite/select/function/max/no_argument, one_argument_*)
        "max": lambda *a: (
            F.greatest(*[_c(x) for x in a]) if len(a) > 1
            else _c(a[0]) if a else F.lit(0)
        ),
        "min": lambda *a: (
            F.least(*[_c(x) for x in a]) if len(a) > 1
            else _c(a[0]) if a else F.lit(0)
        ),
    }


class _PlanCtx:
    """Frame context for plan-level selector functions (sub_filter/query).

    ``refs`` maps a LOCAL reference-column name to ``(foreign_df,
    foreign_key)`` — the Groonga schema's reference column made explicit
    (our parquet tables carry no FK metadata).  ``engine`` serves
    ``query()`` atoms.  Each atom records (flag_column, ids_frame,
    join_column); the wrapper left-joins the deduplicated id frames and the
    boolean flags substitute into the compiled expression."""

    def __init__(self, df, id_col, engine, refs, scorer=None, scan_cols=None):
        self.df = df
        self.id_col = id_col
        self.engine = engine
        self.refs = refs or {}
        self.scorer = scorer  # scorer for query() selector atoms
        # columns with NO backing index: *N/*S on them must error, as the
        # reference does (near/similar need an inverted index —
        # suite/select/filter/near/no_index expects rc<0)
        self.scan_cols = set(scan_cols or ())
        self.atoms: list[tuple[str, "DataFrame", object]] = []


class _P:
    """Precedence-climbing parser → Column tree."""

    # precedence (ECMAScript order, grn_ecmascript.lemon)
    _BIN = {
        "||": 1,
        "&&": 2,
        "&!": 2,
        "|": 3,
        "^": 4,
        "&": 5,
        "==": 6,
        "!=": 6,
        "<": 7,
        ">": 7,
        "<=": 7,
        ">=": 7,
        "@": 7,
        "@^": 7,
        "@$": 7,
        "@~": 7,
        "*N": 7,
        "*S": 7,
        "*T": 7,
        "<<": 8,
        ">>": 8,
        ">>>": 8,
        "+": 9,
        "-": 9,
        "*": 10,
        "/": 10,
        "%": 10,
    }

    def __init__(
        self,
        toks: list[str],
        plan_ctx: "_PlanCtx | None" = None,
        scored: bool = False,
        array_cols: "dict[str, bool] | None" = None,
        tables=None,
        geo_cols: "dict[str, str] | None" = None,
    ):
        self.t = toks
        self.i = 0
        self.fns = _fn_registry()
        self.plan_ctx = plan_ctx
        self.scored = scored
        # array column name → True when an index backs exact element match
        self.array_cols = array_cols or {}
        # table-record literal resolver (grn_expr GET_MEMBER on a table,
        # suite/select/filter/record/key/*: Keywords["groonga"].label):
        # callable name → (df, key_col, key_normalized) or None
        self.tables = tables
        # geo-point column name → datum ("wgs84" | "tokyo")
        self.geo_cols = geo_cols or {}

    def peek(self):
        return self.t[self.i] if self.i < len(self.t) else None

    def next(self):
        tok = self.peek()
        if tok is None:
            raise ScriptSyntaxError("unexpected end of expression")
        self.i += 1
        return tok

    def parse(self) -> Column:
        c = self.expr(0)
        if self.peek() is not None:
            raise ScriptSyntaxError(f"trailing tokens at {self.t[self.i:]}")
        return _c(c)

    def parse_scored(self) -> "tuple[Column, Column | None]":
        """(condition, score) of the whole expression; score is None when
        the expression has no match/comparison atoms (a bare value —
        Groonga truthiness applies, the caller derives the score)."""
        c = self.expr(0)
        if self.peek() is not None:
            raise ScriptSyntaxError(f"trailing tokens at {self.t[self.i:]}")
        if isinstance(c, _Scored):
            return c.cond, c.score
        return _c(c), None

    def expr(self, min_prec: int) -> Column:
        start = self.i
        left = self.unary()
        # the *N/*S/*T match operators need the left operand's COLUMN NAME
        # (they select via the index, not a Column expression) — available
        # only when the left side was exactly one identifier token
        left_name = (
            self.t[start]
            if self.i == start + 1
            and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", self.t[start])
            and self.t[start] not in ("true", "false", "null")
            else None
        )
        while True:
            op = self.peek()
            prec = self._BIN.get(op or "")
            if prec is None or prec < min_prec:
                return left
            self.next()
            right = self.expr(prec + 1)
            if op in ("*N", "*S", "*T"):
                left = self._match_op(op, left, left_name, right)
            else:
                left = self._apply(op, left, right)
            left_name = None

    def unary(self) -> Column:
        tok = self.peek()
        if tok == "!":
            self.next()
            cond = ~_c(self.unary())
            return _Scored(cond, F.lit(1.0)) if self.scored else cond
        if tok == "-":
            self.next()
            return -_c(self.unary())
        if tok == "~":
            self.next()
            return F.bitwise_not(_c(self.unary()))
        return self.postfix(self.primary())

    def postfix(self, base):
        """``col[i]`` vector element access (grn GET_MEMBER —
        suite/select/filter/vector/index_access/*): 0-based index, out of
        range → null (never matches)."""
        while self.peek() == "[":
            self.next()
            idx = self.expr(0)
            if self.next() != "]":
                raise ScriptSyntaxError("expected ]")
            # F.get: 0-based, null on out-of-range (element_at throws
            # under ANSI mode for OOB — reference yields no match instead)
            base = F.get(_c(base), idx if isinstance(idx, int) else _c(idx))
        return base

    def primary(self) -> Column:
        tok = self.next()
        if tok == "(":
            c = self.expr(0)
            if self.next() != ")":
                raise ScriptSyntaxError("expected )")
            return c
        if tok == "[":
            # vector literal (suite/select/filter/vector/equal): elements
            # are script literals
            vals = []
            if self.peek() != "]":
                while True:
                    vals.append(self.expr(0))
                    nxt = self.next()
                    if nxt == "]":
                        break
                    if nxt != ",":
                        raise ScriptSyntaxError("expected , or ] in vector")
            else:
                self.next()
            return vals
        lit = _lit(tok)
        if lit is not None:
            return lit  # raw python value; _c() lifts to Column lazily
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok == "null":
            return F.lit(None)
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", tok):
            if self.peek() == "(":
                return self.call(tok)
            if self.peek() == "[" and self.tables is not None:
                spec = self.tables(tok)
                if spec is not None:
                    return self._record_literal(tok, spec)
            if tok in self.array_cols:
                return _Arr(F.col(tok), self.array_cols[tok])
            if tok in self.geo_cols:
                return _Geo(F.col(tok), self.geo_cols[tok])
            return F.col(tok)
        raise ScriptSyntaxError(f"unexpected token {tok!r}")

    def _record_literal(self, table: str, spec):
        """``Table["key"].col`` — a record looked up by key, then a column
        accessor (grn_expr GET_MEMBER on a table variable;
        suite/select/filter/record/key/{literal,operator}).  The subscript
        must fold to a literal; the single-record value is resolved
        driver-side (one bounded lookup) and substitutes as a literal."""
        self.next()  # [
        key = self.expr(0)
        if self.next() != "]":
            raise ScriptSyntaxError("expected ] after record key")
        if not isinstance(key, (str, int, float)) or isinstance(key, bool):
            raise ScriptSyntaxError("record subscript must be a literal")
        if self.next() != ".":
            raise ScriptSyntaxError("record literal needs a .column accessor")
        field = self.next()
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", field):
            raise ScriptSyntaxError(f"bad record accessor {field!r}")
        df, key_col, key_norm = spec
        if isinstance(key, str) and key_norm:
            # normalized key table: compare normalized-to-normalized
            # (lower() approximates NormalizerAuto on the stored side —
            # exact for ASCII keys)
            from ..normalize import normalize as _norm

            row = df.filter(F.lower(F.col(key_col)) == _norm(key))
        else:
            row = df.filter(F.col(key_col) == key)
        got = row.select(F.col(field)).limit(1).collect()
        if not got:
            # key absent: the accessor reads a nil record → null
            return F.lit(None)
        val = got[0][0]
        return F.lit(None) if val is None else val

    def call(self, name: str) -> Column:
        if name in ("sub_filter", "query"):
            if self.plan_ctx is None:
                raise ScriptSyntaxError(
                    f"{name}() is a plan-level selector — compile the filter "
                    "with parse_filter_plan(src, df, ...) instead of "
                    "parse_filter"
                )
            return self._selector_call(name)
        fn = self.fns.get(name)
        if fn is None:
            raise ScriptSyntaxError(f"unknown function {name!r}")
        self.next()  # (
        args = []
        if self.peek() != ")":
            while True:
                a = self.expr(0)
                args.append(a)
                tok = self.next()
                if tok == ")":
                    break
                if tok != ",":
                    raise ScriptSyntaxError("expected , or ) in call")
            return fn(*self._unlit(args, name))
        self.next()  # )
        return fn()

    def _match_op(self, op: str, left, left_name, right):
        """Script-syntax match operators (grn_ecmascript.lemon MATCH ops;
        suite/select/filter/{near,similar,term_extract}):

        * ``col *N "w1 w2"`` — NEAR via the inverted index (plan-level:
          the engine's near search, same as query-syntax ``*N"..."``).
        * ``col *S "text"``  — SIMILAR via the index with the reference's
          own scorer (w1·(tf+weight), grn_ii_similar_search ii.c:5836).
        * ``col *T "text"``  — TERM_EXTRACT: records whose value occurs in
          the text (grn_pat_scan pat.c:1553) — a pure Column predicate,
          no index needed.  Longest-match non-overlap is NOT enforced
          (contains-semantics); identical for non-overlapping vocabularies.
        """
        if not isinstance(right, str):
            raise ScriptSyntaxError(f"{op} needs a string literal")
        if op == "*T":
            from ..normalize import normalize as _norm

            text = _norm(right)
            # lower() approximates NormalizerAuto on the column side
            # (exact for ASCII); empty values never match (''-contains
            # is vacuously true)
            cond = (F.length(_c(left)) > 0) & F.lit(text).contains(
                F.lower(_c(left))
            )
            return _Scored(cond, F.lit(1.0)) if self.scored else cond
        ctx = self.plan_ctx
        if ctx is None:
            raise ScriptSyntaxError(
                f"{op} is a plan-level selector — compile with "
                "parse_filter_plan(src, df, ...)"
            )
        if left_name is None:
            raise ScriptSyntaxError(f"{op} left side must be a column")
        if ctx.engine is None or left_name in ctx.scan_cols:
            # no index over this column → the reference errors
            # (suite/select/filter/near/no_index)
            raise ScriptSyntaxError(f"{op} needs an index on {left_name!r}")
        flag = f"__m{len(ctx.atoms)}"
        score_alias = f"__s{len(ctx.atoms)}"
        if not right.split():
            # *S "" / *N "" → zero hits, not an error
            # (suite/select/filter/similar/empty_string)
            ids = ctx.df.sparkSession.createDataFrame(
                [], f"`{ctx.id_col}` long, `{score_alias}` double"
            )
        else:
            # route through the query-syntax pragma of the same operator —
            # one engine path for both syntaxes (expr.c:5592-5639)
            esc = right.replace("\\", "\\\\").replace('"', '\\"')
            ctx.engine.select_with_count(
                f'{op}"{esc}"', left_name, k=1, need_full=True,
                count_hits=False, scorer=ctx.scorer or "bm25",
            )
            ids = ctx.engine.last_scored.select(
                F.col("doc_id").alias(ctx.id_col),
                F.col("score").alias(score_alias),
            ).distinct()
        ctx.atoms.append((flag, ids, ctx.id_col))
        cond = F.coalesce(F.col(flag), F.lit(False))
        if self.scored:
            return _Scored(cond, F.coalesce(F.col(score_alias), F.lit(0.0)))
        return cond

    def _selector_call(self, name: str) -> Column:
        """``sub_filter(ref_col, "expr")`` (func_sub_filter, proc.c:5269)
        and ``query(["cols",] "q")`` (func_query, proc.c:5138): parse raw
        argument tokens, register a membership atom, return the flag column
        (null → false after the left join)."""
        ctx = self.plan_ctx
        self.next()  # (
        raw: list[str] = []
        while True:
            tok = self.next()
            if tok == ")":
                break
            if tok != ",":
                raw.append(tok)
        flag = f"__m{len(ctx.atoms)}"
        if name == "sub_filter":
            if len(raw) != 2 or raw[0][0] in "\"'":
                raise ScriptSyntaxError('sub_filter needs (ref_col, "expr")')
            ref, expr = raw[0], _lit(raw[1])
            if not isinstance(expr, str):
                raise ScriptSyntaxError("sub_filter expr must be a string")
            spec = ctx.refs.get(ref)
            if spec is None:
                raise ScriptSyntaxError(
                    f"unknown reference column {ref!r} — register it via "
                    "refs={'local_col': (foreign_df, 'foreign_key')}"
                )
            foreign_df, foreign_key = spec[0], spec[1]
            local = spec[2] if len(spec) > 2 else ref
            is_array = len(spec) > 3 and spec[3]
            key_alias = f"__k{len(ctx.atoms)}"
            ids = (
                foreign_df.filter(parse_filter(expr))
                .select(F.col(foreign_key).alias(key_alias))
                .distinct()
            )
            kind = "array" if is_array else "expr"
            ctx.atoms.append((flag, ids, (kind, local, key_alias)))
        else:  # query
            lits = [_lit(t) for t in raw]
            if len(lits) == 1 and isinstance(lits[0], str):
                mc, q = None, lits[0]
            elif len(lits) == 2 and all(isinstance(x, str) for x in lits):
                mc, q = lits
            else:
                raise ScriptSyntaxError('query needs ("match_cols", "q") or ("q")')
            if ctx.engine is None:
                raise ScriptSyntaxError(
                    "query() needs an engine — pass engine= to parse_filter_plan"
                )
            ctx.engine.select_with_count(
                q, mc, k=1, need_full=True, count_hits=False,
                scorer=ctx.scorer or "bm25",
            )
            score_alias = f"__s{len(ctx.atoms)}"
            ids = (
                ctx.engine.last_scored.select(
                    F.col("doc_id").alias(ctx.id_col),
                    F.col("score").alias(score_alias),
                ).distinct()
            )
            ctx.atoms.append((flag, ids, ctx.id_col))
            cond = F.coalesce(F.col(flag), F.lit(False))
            if self.scored:
                # a query() selector propagates the ENGINE score
                # (func_query proc.c:5138 — select/function/query/selector:
                # weighted match_columns "name * 10" → _score 10)
                return _Scored(cond, F.coalesce(F.col(score_alias), F.lit(0.0)))
            return cond
        cond = F.coalesce(F.col(flag), F.lit(False))
        return _Scored(cond, F.lit(1.0)) if self.scored else cond

    @staticmethod
    def _unlit(args, name):
        # raw python literals flow through unchanged: between's border
        # strings and in_values' value list need real python values
        return args

    def _apply(self, op: str, a, b):
        if op in ("||", "&&", "&!"):
            ca, cb = _cond(a), _cond(b)
            if op == "||":
                cond = ca | cb
            elif op == "&&":
                cond = ca & cb
            else:  # a &! b (GRN_OP_AND_NOT)
                cond = ca & ~F.coalesce(cb, F.lit(False))
            if not self.scored:
                return cond
            # result-set score accumulation (grn res_add, lib/ii.c /
            # operator.c): every satisfied match/comparison atom along the
            # accepted path adds its contribution — OR sums the matched
            # branches, AND sums both sides, AND_NOT keeps the left score
            # (suite/select/score/need_temporary_table/*: a record matched
            # by both OR branches scores 2)
            sa, sb = _score_of(a, ca), _score_of(b, cb)
            if op == "||":
                score = (
                    F.when(F.coalesce(ca, F.lit(False)), sa).otherwise(F.lit(0.0))
                    + F.when(F.coalesce(cb, F.lit(False)), sb).otherwise(F.lit(0.0))
                )
            elif op == "&&":
                score = sa + sb
            else:
                score = sa
            return _Scored(cond, score)
        return self._apply_plain(op, a, b)

    def _apply_plain(self, op: str, a, b):
        scored = self.scored
        if op in ("==", "!=", "<", ">", "<=", ">="):
            if isinstance(a, _Arr) and op in ("==", "!="):
                # vector comparison (suite/select/filter/vector/{equal,
                # not_equal,not_initialized}): the literal never casts to
                # the vector type, so ``==`` only matches via the empty
                # cases — ``vec == ""`` matches EMPTY vectors; ``vec ==
                # [..]`` matches nothing; ``!=`` matches non-empty vectors
                if b == "" or b == []:
                    cond = (
                        F.size(a.col) == 0 if op == "=="
                        else F.size(a.col) > 0
                    )
                else:
                    cond = F.lit(False) if op == "==" else F.size(a.col) > 0
            else:
                cond = {
                    "==": lambda: _c(a) == _c(b),
                    "!=": lambda: _c(a) != _c(b),
                    "<": lambda: _c(a) < _c(b),
                    ">": lambda: _c(a) > _c(b),
                    "<=": lambda: _c(a) <= _c(b),
                    ">=": lambda: _c(a) >= _c(b),
                }[op]()
            return _Scored(cond, F.lit(1.0)) if scored else cond
        if op == "+":
            # constant folding: literal + literal stays a python value so
            # table-record subscripts (Keywords["groo" + "nga"]) and other
            # literal-consuming sites see one literal
            # (suite/select/filter/record/key/operator)
            if isinstance(a, str) and isinstance(b, str):
                return a + b
            if (
                isinstance(a, (int, float)) and isinstance(b, (int, float))
                and not isinstance(a, bool) and not isinstance(b, bool)
            ):
                return a + b
            return _c(a) + _c(b)
        if op == "-":
            return _c(a) - _c(b)
        if op == "*":
            return _c(a) * _c(b)
        if op == "/":
            return _c(a) / _c(b)
        if op == "%":
            return _c(a) % _c(b)
        if op == "&":
            return _c(a).bitwiseAND(_c(b))
        if op == "|":
            return _c(a).bitwiseOR(_c(b))
        if op == "^":
            return _c(a).bitwiseXOR(_c(b))
        if op in ("<<", ">>", ">>>"):
            if not isinstance(b, int):
                raise ScriptSyntaxError(f"shift amount must be an int literal")
            f = {"<<": F.shiftleft, ">>": F.shiftright, ">>>": F.shiftrightunsigned}[op]
            return f(_c(a), b)
        # scan-path string matches run over NormalizerAuto-normalized text
        # (case fold, matching the query-syntax colop scan and the
        # reference's normalizer-aware scan; pattern/needle folded too,
        # except regexp where only the haystack is normalized)
        if op in ("@", "@^", "@$", "@~"):
            if not isinstance(b, str) and not (
                op == "@" and isinstance(b, (int, float))
                and not isinstance(b, bool)
            ):
                # the reference rejects a column as the match value
                # ("can't use column as a value", grn_expr_parse —
                # suite/select/filter/invalid/match/argument/column)
                raise ScriptSyntaxError(
                    f"{op} takes a literal pattern, not a column"
                )
        if op in ("@", "@^", "@$", "@~"):
            if op == "@" and isinstance(b, (int, float)) and not isinstance(b, bool):
                # match on a numeric value is an exact lookup (the index
                # maps whole values — select/index/match/int*, and the
                # scan path agrees: filter/complex 'id @ 1' hits id == 1)
                cond = _c(a) == b
                return _Scored(cond, F.lit(1.0)) if scored else cond
            if isinstance(a, _Arr):
                # vector column: a tag-index-backed match is an exact
                # element lookup (the index lexicon maps whole values —
                # suite/select/score/need_temporary_table/*); without an
                # index each element gets the scalar scan semantics
                if a.exact and op == "@":
                    cond = F.array_contains(a.col, b)
                else:
                    per = {
                        "@": lambda x: F.lower(x).contains(b.lower()),
                        "@^": lambda x: F.lower(x).startswith(b.lower()),
                        "@$": lambda x: F.lower(x).endswith(b.lower()),
                        "@~": lambda x: x.rlike("(?i)" + b),
                    }[op]
                    cond = F.exists(a.col, per)
            elif op == "@":  # substring scan fallback (operator.c:904)
                cond = F.lower(_c(a)).contains(b.lower())
            elif op == "@^":  # prefix (operator.c:913)
                cond = F.lower(_c(a)).startswith(b.lower())
            elif op == "@$":  # suffix (operator.c:922)
                cond = F.lower(_c(a)).endswith(b.lower())
            else:  # @~ regexp scan fallback (operator.c:922 / Onigmo)
                # (?i) rather than lowering the pattern: escapes like \A
                # must survive (suite/select/filter/no_index/regexp/
                # text_text)
                cond = _c(a).rlike("(?i)" + b)
            return _Scored(cond, F.lit(1.0)) if scored else cond
        raise ScriptSyntaxError(f"unhandled operator {op}")


def parse_filter(
    src: str,
    array_cols: "dict[str, bool] | None" = None,
    tables=None,
    geo_cols: "dict[str, str] | None" = None,
) -> Column:
    """Compile a ``--filter`` script expression to a Spark Column."""
    return _P(
        _tokenize(src), array_cols=array_cols, tables=tables,
        geo_cols=geo_cols,
    ).parse()


def parse_filter_scored(
    src: str,
    array_cols: "dict[str, bool] | None" = None,
    tables=None,
    geo_cols: "dict[str, str] | None" = None,
) -> "tuple[Column, Column | None]":
    """Compile a ``--filter`` expression to ``(condition, score)`` —
    the score is the reference's result-set accumulation (each satisfied
    match/comparison atom contributes 1; OR sums matched branches, AND
    sums both sides, AND_NOT keeps the left side).  ``None`` score means
    the expression is a bare value with no atoms (truthiness semantics)."""
    return _P(
        _tokenize(src), scored=True, array_cols=array_cols, tables=tables,
        geo_cols=geo_cols,
    ).parse_scored()


def parse_filter_plan(
    src: str,
    df,
    id_col: str = "doc_id",
    engine=None,
    refs: "dict | None" = None,
):
    """Compile a ``--filter`` expression that may use the plan-level
    selector functions ``sub_filter(ref_col, "expr")`` and
    ``query(["cols",] "q")`` and apply it to ``df``, returning the
    filtered DataFrame.

    Each selector becomes a distributed membership semi-join: its id frame
    is deduplicated, left-joined onto ``df``, and the resulting boolean
    flag substitutes into the surrounding expression — so negation and
    disjunction over selectors stay correct, and nothing is collected to
    the driver.  Plain filters (no selectors) compile to a single Catalyst
    predicate exactly like :func:`parse_filter`."""
    out, _score = _plan_apply(src, df, id_col, engine, refs, scored=False)
    return out


def parse_filter_plan_scored(
    src: str,
    df,
    id_col: str = "doc_id",
    engine=None,
    refs: "dict | None" = None,
    scorer=None,
    scan_cols=None,
    tables=None,
    geo_cols: "dict[str, str] | None" = None,
):
    """Like :func:`parse_filter_plan` but in scored mode: the returned
    frame carries a ``__fscore`` column with the result-set score
    accumulation (query() selectors contribute their engine score,
    every other satisfied atom contributes 1)."""
    out, score = _plan_apply(
        src, df, id_col, engine, refs, scored=True, scorer=scorer,
        scan_cols=scan_cols, tables=tables, geo_cols=geo_cols,
    )
    return out


def _plan_apply(
    src, df, id_col, engine, refs, scored, scorer=None,
    scan_cols=None, tables=None, geo_cols=None,
):
    ctx = _PlanCtx(df, id_col, engine, refs, scorer=scorer, scan_cols=scan_cols)
    p = _P(
        _tokenize(src), plan_ctx=ctx, scored=scored, tables=tables,
        geo_cols=geo_cols,
    )
    if scored:
        cond, score = p.parse_scored()
    else:
        cond, score = p.parse(), None
    out = df
    drop: list[str] = []
    for i, (flag, ids, join) in enumerate(ctx.atoms):
        if isinstance(join, tuple) and join[0] == "array":
            # vector reference: match if ANY element's referenced record
            # passes — the matched key set is tiny (already filtered +
            # distinct), broadcast it whole and test arrays_overlap
            # (func_sub_filter over a COLUMN_VECTOR reference)
            _, local, key_alias = join
            sets = ids.agg(F.collect_set(F.col(key_alias)).alias(key_alias))
            out = out.crossJoin(F.broadcast(sets)).withColumn(
                flag, F.coalesce(
                    F.arrays_overlap(F.col(local), F.col(key_alias)),
                    F.lit(False),
                )
            )
            drop.append(key_alias)
        elif isinstance(join, tuple):
            # (local_expr, foreign_key_alias): the local side may be a
            # struct field (ref stored denormalized) or _key (an index
            # column's reverse reference) — join on the expression
            _, local, key_alias = join
            tagged = ids.withColumn(flag, F.lit(True))
            out = out.join(tagged, F.col(local) == F.col(key_alias), "left")
            drop.append(key_alias)
        else:
            out = out.join(ids.withColumn(flag, F.lit(True)), join, "left")
        drop.append(flag)
        if f"__s{i}" in ids.columns:
            drop.append(f"__s{i}")
    out = out.filter(cond)
    if scored:
        out = out.withColumn(
            "__fscore", score if score is not None else F.lit(1.0)
        )
    return out.drop(*drop), score
