"""select_batch answers a query SET through one shared decode: flat
plans via one broadcast (query_id, term) join + one per-query window,
And/Or/Not trees over term/prefix/phrase/NEAR atoms via _eval against
the shared frames — rank-identical per query to sequential
select(escalate=False) calls, including the fallback union for shapes
the batch path can't fuse (column operators, *S/*T modes, pragmas)."""

import pytest

from groonga_spark.query import engine as eng_mod


@pytest.fixture(scope="module")
def engine(spark, corpus):
    from groonga_spark.query.engine import SearchEngine

    e = SearchEngine.build(corpus, ["content"], tokenizer="code")
    e.index.persist()
    return e


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


QUERIES = {
    "t_single": "merge",
    "t_and": "merge sort",
    "t_or": "merge OR sort",
    "t_dup_and": "merge merge",  # duplicate term doubles the contribution
    "t_and_dead": "merge qzqzqz",  # AND with a zero-df term → 0 hits
    "t_or_dead": "merge OR qzqzqz",
    "t_phrase": '"merge sort"',  # fused via the shared positional decode
    "t_phrase2": '"sort partition"',
    "t_phrase_dead": '"merge qzqzqz"',  # dead gram → 0 hits, no fallback
    "t_not": "merge -sort",  # tree tier: Not
    "t_prefix": "sc*",  # tree tier: prefix expansion
    "t_mixed": 'merge "sort partition"',  # tree tier: And(term, phrase)
    "t_mixed_or": 'qzqzqz OR "merge sort"',  # Or with a dead term branch
    "t_near": "*N5 merge partition",  # tree tier: NEAR atom
    "t_colop_scan": "lang:py merge",  # tree tier: scan-path colop + term
    "t_colop": "content:@merge",  # fallback: INDEXED-column operator
}


def test_batch_identity(engine):
    res = engine.select_batch(QUERIES, k=20)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9))
        )
    for qid, q in QUERIES.items():
        want = _rows(engine.select(q, k=20, escalate=False))
        have = sorted(got.get(qid, []), key=lambda x: (-x[1], x[0]))
        assert have == sorted(want, key=lambda x: (-x[1], x[0])), qid
        if qid not in ("t_and_dead", "t_phrase_dead"):
            assert want, qid  # every other query must actually match


def test_batch_fuses_flat_and_tree_plans(engine, monkeypatch):
    # flat, phrase, NOT, prefix, mixed, and NEAR queries must NOT go
    # through per-query select(); only the colop fallback may
    calls = []
    orig = eng_mod.SearchEngine.select

    def spy(self, query, *a, **kw):
        calls.append(query)
        return orig(self, query, *a, **kw)

    monkeypatch.setattr(eng_mod.SearchEngine, "select", spy)
    engine.select_batch(QUERIES, k=5).collect()
    assert sorted(calls) == sorted([QUERIES["t_colop"]])


def test_batch_tfidf_identity(engine):
    sub = {k: QUERIES[k] for k in ("t_single", "t_and", "t_or", "t_phrase")}
    res = engine.select_batch(sub, k=10, scorer="tf_idf")
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9))
        )
    for qid, q in sub.items():
        want = _rows(engine.select(q, k=10, escalate=False, scorer="tf_idf"))
        have = sorted(got.get(qid, []), key=lambda x: (-x[1], x[0]))
        assert have == sorted(want, key=lambda x: (-x[1], x[0])), qid


def test_batch_tree_lineage_truncated(engine):
    # past BATCH_TREE_CKPT_MIN fused tree queries the shared decode is
    # eagerly localCheckpoint'ed: every tree branch must scan the
    # materialized RDD, and NO Python decode UDF may remain in the final
    # union plan (a 32-branch union re-embedding the decode lineage per
    # branch OOM'd the driver merely rendering its plan string)
    # no NEAR here: its window check is legitimately a post-decode
    # pandas UDF and would appear as EvalPython in any plan
    trees = {
        f"p{i}": q
        for i, q in enumerate(
            ['"merge sort"', '"sort partition"', "merge -sort", "sc*"]
        )
    }
    assert len(trees) >= eng_mod.BATCH_TREE_CKPT_MIN
    df = engine.select_batch(trees, k=5)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ExistingRDD" in plan
    assert "EvalPython" not in plan  # decode already ran, eagerly
    # and the result is still rank-identical per query
    got = {}
    for r in df.collect():
        got.setdefault(r["query_id"], []).append((r["doc_id"], round(r["score"], 9)))
    for qid, q in trees.items():
        want = _rows(engine.select(q, k=5, escalate=False))
        assert sorted(got.get(qid, [])) == sorted(want), qid


def test_batch_empty_set(engine):
    assert engine.select_batch({}, k=5).count() == 0
