"""Groonga command-protocol surface (SURVEY §2.1) over parquet-backed tables.

The reference registers its commands in ``lib/proc.c:6785-6903`` (``load``,
``dump``, ``delete``, ``truncate``, ``select``, ``status``, ``tokenize``,
``normalize``) and serializes responses as JSON/TSV/XML/MessagePack
(``GRN_CONTENT_*``, include/groonga/groonga.h:182-187; lib/output.c).

Spark-first re-expression: a "table" is a parquet directory (the production
shape is an Iceberg table — noted per command below); mutations rewrite
through DataFrame ops so every command stays distributed.  Nothing here
collects more than the response page the caller asked for.
"""

from __future__ import annotations

import json
import re
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query.script import (
    parse_filter,
    parse_filter_plan,
    parse_filter_plan_scored,
    parse_filter_scored,
)

# filters needing the plan-level compile: selector functions and the
# index-backed match operators *N (near) / *S (similar); *T stays a plain
# Column predicate but rides the same path for uniform scoring
_SELECTOR_RE = re.compile(r"\b(sub_filter|query)\s*\(|\*[NS]\b")


def _split_sort_keys(sortby: str) -> list[str]:
    """Split a --sortby list on TOP-LEVEL commas only — an expression key
    like ``geo_distance(point, "0x0")`` keeps its internal commas."""
    parts, depth, start = [], 0, 0
    in_str: str | None = None
    for i, ch in enumerate(sortby):
        if in_str:
            if ch == in_str and sortby[i - 1] != "\\":
                in_str = None
        elif ch in "\"'":
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(sortby[start:i])
            start = i + 1
    parts.append(sortby[start:])
    return [p for p in parts if p.strip()]

_ADJUSTER_RE = re.compile(
    r'\s*(\w+)\s*@\s*"((?:[^"\\]|\\.)*)"\s*(?:\*\s*(\d+(?:\.\d+)?))?\s*'
)


def parse_adjuster(spec):
    """``--adjuster 'col @ "term" * 5 + col @ "other" * 3'`` →
    [("term", 5.0), ("other", 3.0)] (grn_select adjuster syntax,
    lib/proc.c; factor defaults to 1).  A pre-parsed list passes through."""
    if spec is None or isinstance(spec, list):
        return spec
    out = []
    for part in spec.split("+"):
        m = _ADJUSTER_RE.fullmatch(part)
        if not m:
            raise ValueError(f"bad adjuster fragment {part!r}")
        out.append((m.group(2), float(m.group(3) or 1.0)))
    return out


class CommandContext:
    """One database = one set of named tables behind a
    :class:`~groonga_spark.storage.TableStorage` (``grn_db`` analogue).

    The default storage is a parquet directory per table; passing an
    :class:`~groonga_spark.storage.IcebergTableStorage` (or any other
    implementation of the seam) retargets every command without touching
    command semantics — ``load --ifexists`` maps to an overwrite commit
    (MERGE INTO on Iceberg), ``delete`` to DELETE WHERE, ``truncate`` to
    TRUNCATE.  See storage.py for the contract and the sandbox
    constraint notes.
    """

    def __init__(self, spark: SparkSession, db_path: str, storage=None):
        from .storage import ParquetDirStorage

        self.spark = spark
        self.db_path = db_path
        self.storage = storage or ParquetDirStorage(spark, db_path)
        self._engines: dict[str, object] = {}
        self._selectors: dict[str, object] = {}
        self._plugins: dict[str, object] = {}
        # select query cache (lib/cache.c; default capacity = the
        # reference's GRN_CACHE_DEFAULT_MAX_N_ENTRIES 100)
        self._select_cache: "OrderedDict[tuple, dict]" = OrderedDict()
        self._cache_max = 100
        # table → {local_col: (foreign_table, foreign_key)} — the Groonga
        # reference-column schema made explicit (parquet has no FK metadata)
        self._refs: dict[str, dict[str, tuple[str, str]]] = {}
        # table → terms whose LEXICON record was deleted (postings gone)
        self._deleted_terms: dict[str, set] = {}

    def set_reference(
        self,
        table: str,
        local_col: str,
        foreign_table: str,
        foreign_key: str,
        local: str | None = None,
        array: bool = False,
    ) -> None:
        """Declare ``table.local_col`` as a reference into
        ``foreign_table.foreign_key`` — the schema information Groonga's
        reference columns carry implicitly (db.c column types).  Enables
        ``sub_filter(local_col, "expr")`` in ``--filter``.  ``local``
        overrides the LOCAL join expression (default: the column itself) —
        e.g. ``_key`` for an index-column reverse reference, or
        ``col._key`` when the reference is stored as a struct.  ``array``
        marks a COLUMN_VECTOR reference (any-element membership)."""
        self._refs.setdefault(table, {})[local_col] = (
            foreign_table, foreign_key, local or local_col, array,
        )

    # -- table io (all through the storage seam) ---------------------------
    def _read(self, table: str) -> DataFrame:
        return self.storage.read(table)

    def _invalidate(self, table: str) -> None:
        """After a mutation: drop the cached SearchEngine (its stats are
        snapshotted at build time) and Spark's file-index/footer cache for
        the rewritten path (same directory, new files — a stale
        InMemoryFileIndex would list deleted part files)."""
        self._drop_engines(table)
        # grn_cache_expire-on-write: the reference expires the WHOLE query
        # cache on any write (a cached select may depend on other tables
        # via sub_filter), so clear everything, not just this table's keys
        self._select_cache.clear()
        self.storage.refresh(table)

    def table_list(self) -> list[str]:
        return self.storage.list_tables()

    # -- DDL commands (proc.c table_create:2722, column_create:2930,
    #    column_list:3523, table_remove:2852) --------------------------------
    def table_create(self, table: str, schema: str = "_key string") -> None:
        """``table_create --name T``: an empty table with the declared
        schema (storage seam: CREATE TABLE on Iceberg)."""
        if self.storage.exists(table):
            raise ValueError(f"table {table!r} exists")
        self.storage.create(table, self.spark.createDataFrame([], schema))
        self._invalidate(table)

    def table_remove(self, table: str) -> None:
        """``table_remove --name T`` (proc.c:2852)."""
        self.storage.drop(table)
        self._drop_engines(table)
        self._select_cache.clear()

    def column_create(
        self, table: str, name: str, type: str = "string", default=None
    ) -> None:
        """``column_create --table T --name c --type t``: schema evolution
        by rewrite (Iceberg: ALTER TABLE ADD COLUMN, metadata-only)."""
        df = self._read(table)
        if name in df.columns:
            raise ValueError(f"column {name!r} exists")
        self._rewrite(table, df.withColumn(name, F.lit(default).cast(type)))

    def column_list(self, table: str) -> list[tuple[str, str]]:
        """``column_list --table T`` → [(name, type), ...]."""
        return [
            (f.name, f.dataType.simpleString())
            for f in self._read(table).schema.fields
        ]

    def table_rename(self, table: str, new_name: str) -> None:
        """``table_rename --name T --new_name U`` (proc.c:2884): a
        directory move — metadata-only, no data rewrite (Iceberg: ALTER
        TABLE RENAME)."""
        self.storage.rename(table, new_name)
        self._drop_engines(table)
        self._select_cache.clear()
        if table in self._refs:
            self._refs[new_name] = self._refs.pop(table)
        self._invalidate(new_name)

    def column_rename(self, table: str, name: str, new_name: str) -> None:
        """``column_rename --table T --name c --new_name d`` (proc.c:3468):
        rewrite with the column renamed (Iceberg: ALTER TABLE RENAME
        COLUMN, metadata-only)."""
        df = self._read(table)
        if name not in df.columns:
            raise ValueError(f"no column {name!r}")
        if new_name in df.columns:
            raise ValueError(f"column {new_name!r} exists")
        self._rewrite(table, df.withColumnRenamed(name, new_name))

    def column_remove(self, table: str, name: str) -> None:
        """``column_remove --table T --name c`` (proc.c:3430): rewrite
        without the column (Iceberg: ALTER TABLE DROP COLUMN)."""
        df = self._read(table)
        if name not in df.columns:
            raise ValueError(f"no column {name!r}")
        self._rewrite(table, df.drop(name))

    def _rewrite(self, table: str, out: DataFrame) -> None:
        """Full-table rewrite — the storage seam's atomic commit (tmp-dir
        swap on parquet; snapshot replace on Iceberg)."""
        self.storage.overwrite(table, out)
        self._invalidate(table)

    def reindex(
        self,
        table: str,
        text_cols: list[str] | None = None,
        tokenizer: str = "bigram",
        id_col: str = "doc_id",
    ) -> None:
        """``reindex`` (proc.c reindex command): drop the cached engine and
        eagerly rebuild the inverted index for the table."""
        self._drop_engines(table)
        df = self._read(table)
        eng = self._get_engine(table, df, text_cols, tokenizer, id_col)
        eng.index.persist()

    # -- load (proc.c:1371) ------------------------------------------------
    def load(
        self,
        table: str,
        values: "list[dict] | str | DataFrame",
        key_col: str = "_key",
        ifexists: bool = True,
    ) -> int:
        """``load --table T --values [...]``: upsert rows by key.

        ``values`` may be a JSON string (array of objects, as the command
        takes), a list of dicts, or a DataFrame.  ``ifexists=True`` mirrors
        ``--ifexists``: existing keys are replaced (anti-join old, union
        new); False appends only unseen keys.  Returns rows loaded.
        """
        if isinstance(values, str):
            values = json.loads(values)
        if isinstance(values, list):
            new = self.spark.createDataFrame(values)
        else:
            new = values
        n = new.count()
        if self.storage.exists(table):
            old = self._read(table)
            if ifexists:
                keep = old.join(new.select(key_col), key_col, "left_anti")
            else:
                new = new.join(old.select(key_col), key_col, "left_anti")
                n = new.count()
                keep = old
            merged = keep.unionByName(new, allowMissingColumns=True)
            self.storage.overwrite(table, merged)
        else:
            self.storage.create(table, new)
        self._invalidate(table)
        return n

    # -- delete (proc.c:6859) ----------------------------------------------
    def delete(
        self,
        table: str,
        key=None,
        key_col: str = "_key",
        filter: str | None = None,
    ) -> int:
        """``delete --table T [--key k | --filter expr]`` → anti-join
        rewrite (the Iceberg path is DELETE WHERE)."""
        df = self._read(table)
        if key is not None:
            cond = F.col(key_col) == key
        elif filter is not None:
            cond = parse_filter(filter)
        else:
            raise ValueError("delete needs key or filter")
        kept = df.filter(~F.coalesce(cond, F.lit(False)))
        n_before = df.count()
        self.storage.overwrite(table, kept)
        self._invalidate(table)
        n_after = self._read(table).count()
        return n_before - n_after

    # -- truncate (proc.c:6882) --------------------------------------------
    def truncate(self, table: str) -> None:
        """Drop all records, keep schema (Iceberg: TRUNCATE TABLE)."""
        self.storage.overwrite(table, self._read(table).limit(0))
        self._invalidate(table)

    # -- dump (proc.c:6868) ------------------------------------------------
    def dump(self, table: str) -> DataFrame:
        """Source-of-truth export: the records as a DataFrame (the command
        stream's ``load`` section; schema travels in parquet metadata).
        Writing it back via ``load`` round-trips the table."""
        return self._read(table)


    def _drop_engines(self, table: str) -> None:
        """Invalidate every cached engine of ``table`` — the default one
        and any per-tokenizer overrides keyed (table, tokenizer)."""
        for k in [
            k for k in self._engines
            if k == table or (isinstance(k, tuple) and k[0] == table)
        ]:
            self._engines.pop(k, None)

    def delete_terms(self, table: str, terms) -> None:
        """Deleting a LEXICON record drops its postings (grn lexicon↔index
        coupling): record the terms; every engine over ``table`` hides them
        from its dictionary, so query-time token resolution treats them as
        unindexed (delete/index/have_tokenizer)."""
        self._deleted_terms.setdefault(table, set()).update(
            str(t) for t in terms
        )
        self._drop_engines(table)

    def _get_engine(
        self, table, df, text_cols, tokenizer, id_col,
        token_filters=(), stopwords=frozenset(),
    ):
        eng = self._engines.get(table)
        if eng is not None and eng.index.tokenizer != tokenizer:
            # a per-call tokenizer override (an explicitly named lexicon in
            # match_columns) gets its own cached engine alongside the
            # table's default one; mutation invalidation pops both (the
            # tuple key leads with the table name)
            eng = self._engines.get((table, tokenizer))
        if eng is None:
            from .query.engine import SearchEngine

            cols = text_cols or [
                f.name
                for f in df.schema.fields
                if f.dataType.typeName() == "string" and f.name != id_col
            ]
            eng = SearchEngine.build(
                df, cols, tokenizer=tokenizer, id_col=id_col,
                token_filters=tuple(token_filters),
                stopwords=frozenset(stopwords),
            )
            dele = self._deleted_terms.get(table)
            if dele:
                from pyspark.sql import functions as F

                hide = ~F.col("term").isin(sorted(dele))
                eng.index.dictionary = eng.index.dictionary.filter(hide)
                eng.index.postings = eng.index.postings.filter(hide)
            if table in self._engines:
                self._engines[(table, tokenizer)] = eng
            else:
                self._engines[table] = eng
        return eng

    # -- select (grn_select, proc.c:1087) ------------------------------------
    def select(
        self,
        table: str,
        query: str | None = None,
        match_columns: str | None = None,
        filter: str | None = None,
        output_columns: str | None = None,
        sortby: str | None = None,
        offset: int = 0,
        limit: int = 10,
        drilldown: str | None = None,
        drilldowns: dict | None = None,
        columns: dict | None = None,
        text_cols: list[str] | None = None,
        tokenizer: str = "bigram",
        id_col: str = "doc_id",
        scorer: str = "bm25",
        adjuster: "str | list[tuple[str, float]] | None" = None,
        match_escalation_threshold: int = 0,
        query_expander: "dict[str, list[str]] | None" = None,
        query_flags: str | None = None,
        cache: bool = True,
        scan_columns: "list[str] | None" = None,
        array_match: "dict[str, bool] | None" = None,
        table_resolver=None,
        noindex_cols: "list[str] | None" = None,
        token_filters: tuple = (),
        stopwords=frozenset(),
        geo_cols: "dict[str, str] | None" = None,
    ) -> dict:
        """The ``select`` command: fulltext --query via the inverted-index
        engine, --filter via the script compiler, then sort/offset/limit,
        optional drilldowns.  Returns ``{"n_hits", "records", "drilldowns"}``
        with records as a DataFrame (serialize with :func:`format_output`).

        ``n_hits`` is the TOTAL match count (the reference select's first
        output element), never capped by the page size.  Negative offset /
        limit wrap against it per ``grn_normalize_offset_and_limit``:
        offset -5 = 5th-from-last record, limit -1 = everything remaining.

        Results are memoized per full argument vector (the reference's
        query cache, lib/cache.c — select checks it before evaluating,
        ``--cache no`` skips); any mutation of the table flushes its
        entries (grn_cache_expire on write).  ``cache=False`` bypasses
        both lookup and store.
        """
        ck = None
        if cache and not callable(adjuster):
            ck = (table, query, match_columns, filter, output_columns,
                  sortby, offset, limit, drilldown, repr(drilldowns),
                  repr(columns), repr(text_cols), tokenizer, id_col, scorer,
                  repr(adjuster), match_escalation_threshold,
                  repr(query_expander), query_flags, repr(scan_columns),
                  repr(array_match), repr(token_filters),
                  repr(sorted(stopwords)), repr(geo_cols))
            hit = self._select_cache.get(ck)
            if hit is not None:
                self._select_cache.move_to_end(ck)  # LRU touch
                return hit
        df = self._read(table)
        # dynamic columns (--columns[label].stage=initial + .value, the
        # grn_select "columns" parameter, proc.c select_v2 path): computed
        # BEFORE filtering so --filter/--sortby/--output_columns can
        # reference them; the value is a script expression compiled to a
        # Catalyst Column (whole-stage codegen, pushdown-friendly)
        for cname, spec in (columns or {}).items():
            value = spec["value"] if isinstance(spec, dict) else spec
            col = parse_filter(value, geo_cols=geo_cols)
            if isinstance(spec, dict) and spec.get("cast"):
                # integer-typed assignment truncates to the column's
                # storage type (select --scorer 'output /= value')
                col = col.cast(spec["cast"])
            df = df.withColumn(cname, col)
        # a whitespace-only --query parses to an empty expression in the
        # reference → no condition → every record (suite/select/query/
        # space_only fixture); str.split() covers unicode blanks
        if query is not None and not query.split():
            query = None
        # ALLOW_UPDATE: `column:=value` in --query assigns to every matched
        # record (here: the whole table — a bare assignment matches all;
        # get_word expr.c:5722 with GRN_EXPR_ALLOW_UPDATE).  The write goes
        # through load(), which snapshots and invalidates caches.
        if (
            query is not None
            and query_flags
            and "ALLOW_UPDATE" in query_flags
        ):
            m = re.fullmatch(r"\s*([A-Za-z_][\w.]*)\s*:=\s*(\S+)\s*", query)
            if m:
                tgt, rhs = m.groups()
                if tgt not in df.columns:
                    raise ValueError(f"unknown column {tgt!r}")
                val = parse_filter(rhs).cast(df.schema[tgt].dataType)
                self.load(table, df.withColumn(tgt, val), key_col=id_col)
                df = self._read(table)
                query = None
        # a negative offset/limit (or a post-match --filter) needs the FULL
        # match set — the engine's top-k page can't serve it
        need_full = filter is not None or offset < 0 or limit < 0
        if query is not None:
            eng = self._get_engine(
                table, df, text_cols, tokenizer, id_col,
                token_filters, stopwords,
            )
            # per-call scan/index split: a Groonga column with no index
            # column evaluates its query-syntax operators by sequential
            # scan — the engine here always has a dictionary, so the
            # caller declares which columns must NOT use it
            eng.scan_columns = set(scan_columns or ())
            topk, n_ft = eng.select_with_count(
                query,
                match_columns,
                k=max(offset, 0) + max(limit, 0) or 10,
                need_full=need_full,
                scorer=scorer,
                adjuster=parse_adjuster(adjuster),
                escalation_threshold=match_escalation_threshold,
                query_expander=query_expander,
                query_flags=query_flags,
            )
            hits = eng.last_scored if need_full else topk
            df = df.join(hits.withColumnRenamed("doc_id", id_col), id_col)
            if sortby is None:
                sortby = "-_score"
        if filter is not None:
            if _SELECTOR_RE.search(filter):
                # plan-level selectors: sub_filter membership joins resolve
                # through the registered references; query() runs the
                # fulltext engine for this table
                refs = {
                    lc: (self._read(ft), fk, loc, arr)
                    for lc, (ft, fk, loc, arr) in self._refs.get(table, {}).items()
                }
                f_eng = (
                    self._get_engine(
                        table, df, text_cols, tokenizer, id_col,
                        token_filters, stopwords,
                    )
                    if re.search(r"\bquery\s*\(|\*[NS]\b", filter)
                    else self._engines.get(table)
                )
                df = parse_filter_plan_scored(
                    filter, df, id_col=id_col, engine=f_eng, refs=refs,
                    scorer=scorer,
                    # *N/*S error only on columns with NO index at all —
                    # a column may sit in scan_columns for query-syntax
                    # colop purposes (e.g. _key trie ops) while still
                    # carrying a fulltext index
                    scan_cols=set(
                        noindex_cols if noindex_cols is not None
                        else (scan_columns or ())
                    ),
                    tables=table_resolver,
                    geo_cols=geo_cols,
                )
                wants_score = "_score" in (output_columns or "") or (
                    "_score" in (sortby or "")
                )
                if query is None and wants_score and "score" not in df.columns:
                    df = df.withColumnRenamed("__fscore", "score")
                df = df.drop("__fscore")
            else:
                cond, fscore = parse_filter_scored(
                    filter, array_cols=array_match, tables=table_resolver,
                    geo_cols=geo_cols,
                )
                if fscore is not None:
                    # boolean expression of match/comparison atoms: the
                    # score is the result-set accumulation (each satisfied
                    # atom adds 1 — OR sums matched branches, AND both
                    # sides; suite/select/score/need_temporary_table/*)
                    match, score_expr = cond, fscore
                else:
                    # Groonga truthiness (grn_obj_is_true): a non-boolean
                    # filter value matches unless it is false/0/null; the
                    # scan-match _score is the value coerced to a number,
                    # defaulting to 1 (suite/select/filter/no_index/score/*:
                    # --filter '"29"' → _score 29, '"string"' → 1, a vector
                    # → 1).  The score column is only attached when the
                    # request references _score, keeping plain filter plans
                    # unchanged.
                    dt = df.select(cond.alias("__c")).schema[0].dataType.simpleString()
                    score_expr = F.lit(1).cast("double")
                    if dt == "boolean":
                        match = cond
                    elif dt in ("string",):
                        match = cond.isNotNull() & (F.length(cond) > 0)
                        score_expr = F.coalesce(
                            cond.try_cast("double"), F.lit(1.0)
                        )
                    elif dt.startswith(("array", "map", "struct")):
                        match = cond.isNotNull()
                    else:  # numeric
                        match = cond.isNotNull() & (cond != 0)
                        score_expr = cond.cast("double")
                df = df.filter(match)
                wants_score = "_score" in (output_columns or "") or "_score" in (
                    sortby or ""
                )
                if query is None and wants_score and "score" not in df.columns:
                    df = df.withColumn("score", score_expr)

        if query is not None and not need_full:
            n_hits = n_ft  # exact total from the engine's single evaluation
        else:
            n_hits = df.count()

        # grn_normalize_offset_and_limit (reference lib/util.c): negative
        # values wrap against the hit count; out-of-range clamps to empty
        if offset < 0:
            offset = max(n_hits + offset, 0)
        if limit < 0:
            limit = max(n_hits + limit + 1 - offset, 0)

        if sortby:
            keys = []
            for part in _split_sort_keys(sortby):
                part = part.strip()
                desc = part.startswith("-")
                name = part.lstrip("+-")
                if "(" in name:
                    # expression sort key (--sortby 'geo_distance(point,
                    # "0x0")' — grn_table_sort on an expr key)
                    key = parse_filter(name, geo_cols=geo_cols)
                else:
                    name = {"_score": "score", "_id": id_col}.get(name, name)
                    key = F.col(name)
                keys.append(key.desc() if desc else key.asc())
            df = df.orderBy(*keys)
        page = df.offset(offset).limit(limit) if offset else df.limit(limit)

        if output_columns:
            cols = [c.strip() for c in output_columns.split(",")]
            cols = [{"_score": "score", "_id": id_col}.get(c, c) for c in cols]
            page = page.select(*cols)

        dd = {}
        for key in (drilldown or "").split(","):
            key = key.strip()
            if key:
                dd[key] = (
                    df.groupBy(key)
                    .agg(F.count("*").alias("_nsubrecs"))
                    .orderBy(F.desc("_nsubrecs"), F.asc(key))
                )
        # labeled drilldowns with per-label output params
        # (--drilldowns[label].keys/.calc_types/.sortby/.offset/.limit/
        # .output_columns — grn_select_drilldowns, proc.c:784-875)
        _calc = {"sum": F.sum, "max": F.max, "min": F.min, "avg": F.avg}
        for label, spec in (drilldowns or {}).items():
            keys = spec["keys"]
            keys = [keys] if isinstance(keys, str) else list(keys)
            aggs = [F.count("*").alias("_nsubrecs")]
            for fn, target in spec.get("calc", []):
                aggs.append(_calc[fn](target).alias(f"_{fn}"))
            g = df.groupBy(*keys).agg(*aggs)
            sort_cols = []
            for part in spec.get("sortby", "-_nsubrecs").split(","):
                part = part.strip()
                if not part:
                    continue
                name = part.lstrip("+-")
                sort_cols.append(
                    F.col(name).desc() if part.startswith("-") else F.col(name).asc()
                )
            # trailing group keys pin a deterministic total order
            g = g.orderBy(*sort_cols, *[F.col(k2).asc() for k2 in keys])
            d_off = int(spec.get("offset", 0))
            d_lim = spec.get("limit")
            if d_off:
                g = g.offset(d_off)
            if d_lim is not None:
                g = g.limit(int(d_lim))
            if spec.get("output_columns"):
                g = g.select(
                    *[c.strip() for c in spec["output_columns"].split(",")]
                )
            dd[label] = g
        out = {"n_hits": n_hits, "records": page, "drilldowns": dd}
        if ck is not None:
            self._select_cache[ck] = out
            while len(self._select_cache) > self._cache_max:
                self._select_cache.popitem(last=False)  # evict LRU
        return out

    # -- sharding commands (plugins/sharding/logical_*.rb) ------------------
    @staticmethod
    def _range_filter_expr(
        shard_key: str,
        min_v,
        max_v,
        min_border: str = "include",
        max_border: str = "exclude",
        filter: str | None = None,
    ) -> str | None:
        parts = []
        if min_v is not None:
            op = ">=" if min_border == "include" else ">"
            parts.append(f'{shard_key} {op} "{min_v}"')
        if max_v is not None:
            op = "<=" if max_border == "include" else "<"
            parts.append(f'{shard_key} {op} "{max_v}"')
        if filter:
            parts.append(f"({filter})")
        return " && ".join(parts) or None

    def logical_select(
        self,
        table: str,
        shard_key: str = "ts",
        min_v=None,
        max_v=None,
        min_border: str = "include",
        max_border: str = "exclude",
        filter: str | None = None,
        **select_kw,
    ) -> dict:
        """``logical_select`` (plugins/sharding/logical_select.rb): select
        across time shards.  The reference walks per-day shard tables; the
        Spark-native shape is ONE time-partitioned table where the shard
        range compiles to a partition-pruning predicate — the scan touches
        only the shards in range (``PartitionFilters`` in the plan)."""
        cond = self._range_filter_expr(
            shard_key, min_v, max_v, min_border, max_border, filter
        )
        return self.select(table, filter=cond, **select_kw)

    def logical_range_filter(
        self,
        table: str,
        shard_key: str = "ts",
        min_v=None,
        max_v=None,
        min_border: str = "include",
        max_border: str = "exclude",
        filter: str | None = None,
        order: str = "ascending",
        offset: int = 0,
        limit: int = 10,
        output_columns: str | None = None,
    ) -> DataFrame:
        """``logical_range_filter`` (logical_range_filter.rb): the
        early-terminating ordered slice over the shard range — shard-key
        order + limit, i.e. Catalyst's TakeOrderedAndProject over the
        pruned scan (the reference stops walking shards once the limit
        fills; top-k over pruned partitions is the same work-skipping)."""
        res = self.logical_select(
            table,
            shard_key,
            min_v,
            max_v,
            min_border,
            max_border,
            filter,
            sortby=(("-" if order == "descending" else "") + shard_key),
            offset=offset,
            limit=limit,
            output_columns=output_columns,
        )
        return res["records"]

    def logical_count(
        self,
        table: str,
        shard_key: str = "ts",
        min_v=None,
        max_v=None,
        min_border: str = "include",
        max_border: str = "exclude",
        filter: str | None = None,
    ) -> int:
        """``logical_count`` (logical_count.rb): count over the shard
        range — a pruned scan + count, nothing collected."""
        df = self._read(table)
        cond = self._range_filter_expr(
            shard_key, min_v, max_v, min_border, max_border, filter
        )
        if cond:
            df = df.filter(parse_filter(cond))
        return df.count()

    # -- introspection (proc.c tokenizer_list:6545, normalizer_list:6584) ----
    def tokenizer_list(self) -> list[dict]:
        """``tokenizer_list`` → every registered tokenizer, with the
        Groonga-style name alongside our registry key."""
        from .tokenize import ALL_TOKENIZERS

        def grn_name(key: str) -> str:
            if key == "code":
                return "TokenCode"  # this engine's code-aware addition
            return "Token" + "".join(p.capitalize() for p in key.split("_"))

        return [{"name": grn_name(k), "key": k} for k in ALL_TOKENIZERS]

    def normalizer_list(self) -> list[dict]:
        """``normalizer_list`` → registered normalizers (the reference
        ships NormalizerAuto + NFKC51; ours implements the Auto path,
        normalize.py)."""
        return [{"name": "NormalizerAuto", "key": "auto"}]

    # -- table_tokenize (proc.c:6521) ----------------------------------------
    def table_tokenize(
        self,
        table: str,
        string: str,
        mode: str = "GET",
        text_cols: list[str] | None = None,
        tokenizer: str = "bigram",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """``table_tokenize --table T --string s --mode GET|ADD``: tokenize
        ``string`` with the table's tokenizer + token filters and resolve
        each token against the table's lexicon → (pos, token, term_id, df).

        GET uses query-mode tokenization (stopwords dropped, overlapping
        code tokens skipped, trailing short gram handled — engine
        ``_get_tokens``); ADD uses document-mode (every emitted token).
        Unknown tokens keep ``term_id``/``df`` null — the reference's ADD
        registers them in the lexicon, which here is :meth:`reindex`'s job
        (the index is rebuilt from documents, not patched per string).
        """
        df = self._read(table)
        eng = self._get_engine(table, df, text_cols, tokenizer, id_col)
        if mode.upper() == "GET":
            terms, poss = eng._get_tokens(string)
        else:
            from .tokenize import tokenize_batch

            terms, poss = tokenize_batch([string], eng.index.tokenizer)[0]
        toks = self.spark.createDataFrame(
            list(zip(poss, terms)) or [(None, None)], "pos int, token string"
        ).filter(F.col("token").isNotNull())
        # term_id is global (PAT-key order over the whole lexicon —
        # dense_term_ids), so assign BEFORE filtering to the token set;
        # the filtered slice is tiny and broadcast into the join
        from .index.build import dense_term_ids

        dct = dense_term_ids(eng.index.dictionary).filter(
            F.col("term").isin(sorted(set(terms)))
        ).select(F.col("term").alias("token"), "term_id", "df")
        return toks.join(F.broadcast(dct), "token", "left").select(
            "pos", "token", "term_id", "df"
        ).orderBy("pos", "token")

    # -- dump as command stream (proc.c:6868 dump emits re-loadable
    #    table_create/column_create/load commands) --------------------------
    def dump_commands(self, limit: int = 1000) -> str:
        """Whole-database export as a Groonga command stream: replaying the
        returned text against a fresh :class:`CommandContext` (via
        :func:`replay_commands`) recreates every table.  ``limit`` caps the
        rows collected PER TABLE — this is a driver-side export for small /
        sampled databases; bulk export is :meth:`dump` (stays a
        DataFrame)."""
        parts = []
        for t in self.table_list():
            cols = self.column_list(t)
            schema = ", ".join(f"{n} {ty}" for n, ty in cols)
            parts.append(f"table_create --name {t} --schema {schema!r}")
            rows = [r.asDict() for r in self._read(t).limit(limit).collect()]
            parts.append(
                f"load --table {t}\n" + json.dumps(rows, default=str)
            )
        return "\n".join(parts)

    # -- define_selector (proc.c:1354) ---------------------------------------
    def define_selector(self, name: str, **defaults):
        """``define_selector --name N --table T ...``: register ``N`` as a
        new command = :meth:`select` with the given arguments pre-bound
        (callers may override any of them per call)."""

        def _sel(**kw):
            return self.select(**{**defaults, **kw})

        self._selectors[name] = _sel
        return _sel

    def call(self, name: str, **kw):
        """Invoke a selector registered by :meth:`define_selector`."""
        return self._selectors[name](**kw)

    # -- plugin_register / plugin_unregister (proc.c:6724,6755; the
    #    reference dlopens a .so and runs grn_plugin_register — ours imports
    #    a Python module and runs its ``register(ctx)`` hook) ---------------
    def plugin_register(self, module_name: str) -> None:
        """Import ``module_name`` and call its ``register(ctx)`` hook; the
        plugin may add script functions
        (:func:`groonga_spark.query.script.register_function`), selectors
        (:meth:`define_selector`), or table references."""
        import importlib

        mod = importlib.import_module(module_name)
        mod.register(self)
        self._plugins[module_name] = mod

    def plugin_unregister(self, module_name: str) -> None:
        """Run the plugin's ``unregister(ctx)`` hook if present and forget
        it (the reference unloads the shared object)."""
        mod = self._plugins.pop(module_name, None)
        if mod is not None and hasattr(mod, "unregister"):
            mod.unregister(self)

    # -- cache_limit (proc.c:6838; lib/cache.c grn_cache_set_max_n_entries) --
    def cache_limit(self, max: int | None = None) -> int:
        """``cache_limit [--max N]``: return the select-cache capacity —
        the PREVIOUS one when ``max`` is given (grn_cache_set_max_n_entries
        returns the old size; cache_limit/valid/set).  0 disables;
        shrinking evicts LRU immediately, as the reference reallocates the
        cache.  A negative max is an invalid unsigned integer → error."""
        prev = self._cache_max
        if max is not None:
            if int(max) < 0:
                raise ValueError(f"invalid unsigned integer: {max}")
            self._cache_max = int(max)
            while len(self._select_cache) > self._cache_max:
                self._select_cache.popitem(last=False)
        return prev

    # -- status (proc.c:6797) ----------------------------------------------
    def status(self) -> dict:
        return {
            "alloc_count": 0,
            "version": "groonga_spark",
            "n_tables": len(self.table_list()),
            "n_queries_cached": len(self._select_cache),
            "db_path": self.db_path,
        }


def replay_commands(ctx: CommandContext, stream: str) -> None:
    """Replay a :meth:`CommandContext.dump_commands` stream into ``ctx`` —
    the reference's restore path is piping the dump back through the
    command interpreter."""
    lines = stream.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("table_create "):
            m = re.match(r"table_create --name (\w+) --schema '([^']*)'", line)
            if not m:
                raise ValueError(f"bad table_create line {line!r}")
            ctx.table_create(m.group(1), m.group(2))
        elif line.startswith("load "):
            m = re.match(r"load --table (\w+)", line)
            i += 1
            rows = json.loads(lines[i])
            if rows:
                ctx.load(m.group(1), rows, key_col=next(iter(rows[0])))
        i += 1


# -- output serialization (lib/output.c; GRN_CONTENT_*) ----------------------


def format_output(df: DataFrame, content_type: str = "json", limit: int = 1000):
    """Serialize a result page per ``output.c`` / GRN_CONTENT_*
    (groonga.h:182-187): JSON is the Groonga response body shape
    ``[[count], [[name,type]...], rows...]``; TSV matches GRN_CONTENT_TSV;
    XML mirrors the RESULTSET/HIT/FIELD element shape; ``msgpack`` packs
    the same structure as JSON through the pure-Python codec in
    :mod:`groonga_spark.msgpack` (returns ``bytes``).  ``limit`` caps the
    driver-side collect — this formats a RESPONSE PAGE, never a full
    table."""
    rows = df.limit(limit).collect()
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    if content_type == "json":
        body = [
            [[len(rows)], [list(f) for f in fields]]
            + [[r[name] for name, _ in fields] for r in rows]
        ]
        return json.dumps(body, default=str)
    if content_type == "tsv":
        lines = ["\t".join(name for name, _ in fields)]
        for r in rows:
            lines.append("\t".join("" if r[n] is None else str(r[n]) for n, _ in fields))
        return "\n".join(lines)
    if content_type == "xml":
        from xml.sax.saxutils import escape, quoteattr

        parts = [f'<RESULTSET NHITS="{len(rows)}">']
        for no, r in enumerate(rows, 1):
            cells = "".join(
                f"<FIELD NAME={quoteattr(name)}>"
                + escape("" if r[name] is None else str(r[name]))
                + "</FIELD>"
                for name, _ in fields
            )
            parts.append(f'<HIT NO="{no}">{cells}</HIT>')
        parts.append("</RESULTSET>")
        return "".join(parts)
    if content_type == "msgpack":
        from . import msgpack

        def _plain(v):
            if v is None or isinstance(v, (bool, int, float, str, bytes)):
                return v
            if isinstance(v, (list, tuple)):
                return [_plain(x) for x in v]
            return str(v)

        body = [
            [[len(rows)], [list(f) for f in fields]]
            + [[_plain(r[name]) for name, _ in fields] for r in rows]
        ]
        return msgpack.packb(body)
    raise NotImplementedError(f"content_type {content_type!r}")
