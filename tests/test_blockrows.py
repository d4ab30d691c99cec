"""One-block-per-row postings layout (index/blockrows.py): query
identity with the packed layout, delta-commit correctness (scores
identical to a full rebuild of the updated corpus), churn-proportional
write amplification, and compaction identity."""

import os

import pytest
from pyspark.sql import functions as F

from groonga_spark import SearchEngine, build_index
from groonga_spark.corpus import corpus_df
from groonga_spark.index.blockrows import (
    commit_update,
    compact,
    read_index_block_rows,
    write_index_block_rows,
)

QUERIES = ["index", "merge sort", '"def get"', "load OR save", "query -token"]


def _top(eng, q, k=15):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in eng.select(q, k=k, escalate=False).collect()
    ]


@pytest.fixture(scope="module")
def corpora(spark):
    v1 = corpus_df(spark, 120, seed=42).persist()
    fresh = corpus_df(spark, 150, seed=99).persist()
    replaced_new = fresh.filter((F.col("doc_id") > 10) & (F.col("doc_id") <= 20))
    added = fresh.filter(F.col("doc_id") > 120)
    old_docs = v1.filter(F.col("doc_id") <= 20)
    new_docs = replaced_new.unionByName(added)
    v2 = (
        v1.filter(F.col("doc_id") > 20)
        .unionByName(replaced_new)
        .unionByName(added)
        .persist()
    )
    return v1, v2, old_docs, new_docs


@pytest.fixture(scope="module")
def br_path(spark, corpora, tmp_path_factory):
    v1 = corpora[0]
    idx = build_index(v1, ["content"], tokenizer="code", n_pbuckets=8)
    path = str(tmp_path_factory.mktemp("br") / "idx")
    write_index_block_rows(idx, path)
    return path, idx


def test_query_identity_packed_vs_block_rows(spark, br_path):
    path, idx = br_path
    packed = SearchEngine(idx)
    br = SearchEngine(read_index_block_rows(spark, path))
    for q in QUERIES:
        assert _top(br, q) == _top(packed, q), q


def test_delta_commit_matches_full_rebuild(spark, corpora, br_path):
    path, _ = br_path
    v1, v2, old_docs, new_docs = corpora
    upd = commit_update(path, old_docs, new_docs, n_pbuckets=8)
    assert upd.bounds_exact is False
    full = build_index(v2, ["content"], tokenizer="code", n_pbuckets=8)

    # stats + dictionary identical to the rebuild
    assert upd.stats.n_docs == full.stats.n_docs
    assert upd.stats.section_tokens == full.stats.section_tokens
    d_upd = {r["term"]: (r["df"], r["cf"]) for r in upd.dictionary.collect()}
    d_full = {r["term"]: (r["df"], r["cf"]) for r in full.dictionary.collect()}
    assert d_upd == d_full

    # scores identical to the rebuild on every query
    e_upd, e_full = SearchEngine(upd), SearchEngine(full)
    for q in QUERIES:
        assert _top(e_upd, q) == _top(e_full, q), q

    # a reload (fresh reader) sees the same committed state
    e_re = SearchEngine(read_index_block_rows(spark, path))
    for q in QUERIES:
        assert _top(e_re, q) == _top(e_full, q), q

    # block keys stayed unique (layout invariant)
    rows = read_index_block_rows(spark, path).postings_rows
    assert (
        rows.groupBy("term", "first_doc_id").count().filter("count > 1").count()
        == 0
    )

    # write amplification: the delta touched a small fraction of blocks
    dels = spark.read.parquet(os.path.join(path, "postings_deletes"))
    n_live = rows.count()
    assert 0 < dels.count() < n_live

    # compaction folds tombstones without changing results
    compact(path)
    assert (
        spark.read.parquet(os.path.join(path, "postings_deletes")).count() == 0
    )
    e_c = SearchEngine(read_index_block_rows(spark, path))
    for q in QUERIES:
        assert _top(e_c, q) == _top(e_full, q), q


def test_apply_update_on_block_rows_index(spark, corpora, tmp_path):
    # the packed apply_update API also works on a block_rows-loaded index
    # (compat path: regroup non-touched rows + reenc)
    from groonga_spark.index.update import apply_update

    v1, v2, old_docs, new_docs = corpora
    idx = build_index(v1, ["content"], tokenizer="code", n_pbuckets=8)
    path = str(tmp_path / "idx")
    write_index_block_rows(idx, path)
    br = read_index_block_rows(spark, path)
    upd = apply_update(br, old_docs, new_docs, n_pbuckets=8)
    full = build_index(v2, ["content"], tokenizer="code", n_pbuckets=8)
    e_upd, e_full = SearchEngine(upd), SearchEngine(full)
    for q in QUERIES[:3]:
        assert _top(e_upd, q) == _top(e_full, q), q


def test_append_only_commit_and_compact(spark, corpora, tmp_path):
    # append-only mode: no decode at commit; dead docs masked at decode
    # time by gen-aware doc tombstones; scores must STILL be
    # rebuild-identical, including for REPLACED docs (same id, new gen)
    v1, v2, old_docs, new_docs = corpora
    idx = build_index(v1, ["content"], tokenizer="code", n_pbuckets=8)
    path = str(tmp_path / "idx")
    write_index_block_rows(idx, path)
    upd = commit_update(path, old_docs, new_docs, n_pbuckets=8, mode="append_only")
    assert upd.bounds_exact is False
    assert upd.n_doc_tombstones > 0
    full = build_index(v2, ["content"], tokenizer="code", n_pbuckets=8)

    assert upd.stats.n_docs == full.stats.n_docs
    d_upd = {r["term"]: (r["df"], r["cf"]) for r in upd.dictionary.collect()}
    d_full = {r["term"]: (r["df"], r["cf"]) for r in full.dictionary.collect()}
    assert d_upd == d_full

    e_upd, e_full = SearchEngine(upd), SearchEngine(full)
    for q in QUERIES:
        assert _top(e_upd, q) == _top(e_full, q), q

    # packed APIs are refused until compaction
    from groonga_spark.index.update import apply_update

    with pytest.raises(RuntimeError, match="doc tombstones"):
        apply_update(upd, old_docs.limit(1), new_docs.limit(0), n_pbuckets=8)

    # a second append-only commit stacks correctly (re-replace some docs)
    old2 = v2.filter(F.col("doc_id").isin([15, 16, 30]))
    new2 = old2.withColumn(
        "content", F.concat(F.lit("second revision "), F.col("content"))
    )
    v3 = v2.filter(~F.col("doc_id").isin([15, 16, 30])).unionByName(new2)
    upd2 = commit_update(path, old2, new2, n_pbuckets=8, mode="append_only")
    full3 = build_index(v3, ["content"], tokenizer="code", n_pbuckets=8)
    e_upd2, e_full3 = SearchEngine(upd2), SearchEngine(full3)
    for q in QUERIES:
        assert _top(e_upd2, q) == _top(e_full3, q), q

    # compaction folds doc tombstones via the deferred block rewrite
    compact(path)
    re = read_index_block_rows(spark, path)
    assert getattr(re, "n_doc_tombstones", 0) == 0
    assert not os.path.exists(os.path.join(path, "doc_deletes"))
    e_c = SearchEngine(re)
    for q in QUERIES:
        assert _top(e_c, q) == _top(e_full3, q), q


def test_surgical_after_append_only(spark, corpora, tmp_path):
    # mixed history: an append-only commit (doc tombstones pending)
    # followed by a SURGICAL commit — the surgical decode must apply the
    # doc mask (dead docs may not resurrect into re-encoded blocks) and
    # new rows must outrank older tombstones' generations
    v1, v2, old_docs, new_docs = corpora
    idx = build_index(v1, ["content"], tokenizer="code", n_pbuckets=8)
    path = str(tmp_path / "idx")
    write_index_block_rows(idx, path)
    commit_update(path, old_docs, new_docs, mode="append_only")

    old2 = v2.filter(F.col("doc_id").isin([15, 16, 30]))
    new2 = old2.withColumn(
        "content", F.concat(F.lit("second revision "), F.col("content"))
    )
    v3 = v2.filter(~F.col("doc_id").isin([15, 16, 30])).unionByName(new2)
    upd = commit_update(path, old2, new2, mode="surgical")
    full = build_index(v3, ["content"], tokenizer="code", n_pbuckets=8)
    e_upd, e_full = SearchEngine(upd), SearchEngine(full)
    for q in QUERIES:
        assert _top(e_upd, q) == _top(e_full, q), q
