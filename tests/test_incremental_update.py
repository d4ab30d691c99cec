"""Incremental update (grn_ii_column_update analogue, lib/ii.c:5120-5338):
an upsert/delete batch applied via segment algebra must yield an index whose
query results are rank- AND score-identical to a full rebuild of the updated
corpus, and whose dictionary/stats match exactly."""

import pytest
from pyspark.sql import functions as F

from groonga_spark import SearchEngine, build_index
from groonga_spark.corpus import corpus_df
from groonga_spark.index.update import apply_update

QUERIES = ["index", "merge sort", '"def get"', "load OR save", "query -token"]


@pytest.fixture(scope="module")
def v1_v2(spark):
    # v2 = v1 with 10 docs deleted, 10 replaced (content of a different
    # seed), 15 added.  doc_ids are 1-based (grn_id semantics).
    v1 = corpus_df(spark, 120, seed=42).persist()
    fresh = corpus_df(spark, 150, seed=99).persist()
    replaced_new = fresh.filter((F.col("doc_id") > 10) & (F.col("doc_id") <= 20))
    added = fresh.filter(F.col("doc_id") > 120)  # ids 121..150
    old_docs = v1.filter(F.col("doc_id") <= 20)  # deleted (1..10) + replaced
    new_docs = replaced_new.unionByName(added)
    v2 = (
        v1.filter(F.col("doc_id") > 20)
        .unionByName(replaced_new)
        .unionByName(added)
        .persist()
    )
    assert v2.count() == v2.select("doc_id").distinct().count()
    return v1, v2, old_docs, new_docs


def test_incremental_matches_full_rebuild(spark, v1_v2):
    v1, v2, old_docs, new_docs = v1_v2
    idx1 = build_index(v1, ["content"], tokenizer="code", n_pbuckets=8)
    upd = apply_update(idx1, old_docs, new_docs, n_pbuckets=8)
    full = build_index(v2, ["content"], tokenizer="code", n_pbuckets=8)

    # stats identical
    assert upd.stats.n_docs == full.stats.n_docs
    assert upd.stats.section_tokens == full.stats.section_tokens

    # dictionary identical (df + cf per term)
    d_upd = {(r["term"]): (r["df"], r["cf"]) for r in upd.dictionary.collect()}
    d_full = {(r["term"]): (r["df"], r["cf"]) for r in full.dictionary.collect()}
    assert d_upd == d_full

    # no tombstoned doc survives anywhere in the postings
    from groonga_spark.query.decode import decoded_postings

    alive = decoded_postings(
        upd.postings.select("term", "df", F.explode("blocks").alias("b")).select(
            "term", "df", "b.*"
        ),
        with_pos=False,
    )
    gone = alive.join(
        old_docs.select("doc_id").join(
            new_docs.select("doc_id"), "doc_id", "left_anti"
        ),
        "doc_id",
    )
    assert gone.count() == 0

    # query results rank- and score-identical
    e_upd, e_full = SearchEngine(upd), SearchEngine(full)
    for q in QUERIES:
        r_u = [(r["doc_id"], round(r["score"], 9)) for r in e_upd.select(q, k=20, escalate=False).collect()]
        r_f = [(r["doc_id"], round(r["score"], 9)) for r in e_full.select(q, k=20, escalate=False).collect()]
        assert r_u == r_f, q


def test_pure_delete_and_pure_insert(spark, v1_v2):
    v1, _, _, _ = v1_v2
    idx1 = build_index(v1, ["content"], tokenizer="code", n_pbuckets=8)

    # pure delete of 5 docs
    dels = v1.filter(F.col("doc_id") <= 5)
    upd = apply_update(idx1, dels, dels.limit(0), n_pbuckets=8)
    rest = v1.filter(F.col("doc_id") > 5)
    full = build_index(rest, ["content"], tokenizer="code", n_pbuckets=8)
    assert upd.stats.n_docs == full.stats.n_docs
    r_u = SearchEngine(upd).select("index", k=10, escalate=False).collect()
    r_f = SearchEngine(full).select("index", k=10, escalate=False).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in r_u] == [
        (r["doc_id"], round(r["score"], 9)) for r in r_f
    ]

    # pure insert of 8 docs (v1 ids end at 120; extras are 121..128)
    extra = corpus_df(spark, 128, seed=7).filter(F.col("doc_id") > 120)
    upd2 = apply_update(idx1, dels.limit(0), extra, n_pbuckets=8)
    full2 = build_index(v1.unionByName(extra), ["content"], tokenizer="code", n_pbuckets=8)
    assert upd2.stats.n_docs == full2.stats.n_docs
    r_u2 = SearchEngine(upd2).select("merge", k=10, escalate=False).collect()
    r_f2 = SearchEngine(full2).select("merge", k=10, escalate=False).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in r_u2] == [
        (r["doc_id"], round(r["score"], 9)) for r in r_f2
    ]


def test_pruning_sound_after_update(spark, v1_v2):
    # after an update the untouched blocks keep their BUILD-time
    # max_score (bounds_exact=False); the forced-on pruning paths must
    # substitute the query-time derived bound and stay rank-identical to
    # the un-pruned decode — inserts RAISE n_docs (idf grows), which is
    # exactly the case where the stale stored bound would be unsound
    from groonga_spark.query import engine as eng_mod

    v1, _, _, _ = v1_v2
    idx1 = build_index(v1, ["content"], tokenizer="code", n_pbuckets=8)
    extra = corpus_df(spark, 220, seed=11).filter(F.col("doc_id") > 120)
    upd = apply_update(idx1, v1.limit(0), extra, n_pbuckets=8)
    assert upd.bounds_exact is False
    eng = SearchEngine(upd)

    old = (
        eng_mod.SINGLE_TERM_PRUNE_CUTOFF,
        eng_mod.WAND_OR_CUTOFF,
    )
    try:
        eng_mod.SINGLE_TERM_PRUNE_CUTOFF = -1
        eng_mod.WAND_OR_CUTOFF = -1
        pruned_single = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.select("index", k=15, escalate=False).collect()
        ]
        pruned_or = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.select("merge OR index", k=15, escalate=False).collect()
        ]
        eng_mod.SINGLE_TERM_PRUNE_CUTOFF = 10**18
        eng_mod.WAND_OR_CUTOFF = 10**18
        flat_single = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.select("index", k=15, escalate=False).collect()
        ]
        flat_or = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.select("merge OR index", k=15, escalate=False).collect()
        ]
    finally:
        eng_mod.SINGLE_TERM_PRUNE_CUTOFF, eng_mod.WAND_OR_CUTOFF = old
    assert pruned_single == flat_single
    assert pruned_or == flat_or


def test_bounds_exact_survives_index_roundtrip(spark, tmp_path, v1_v2):
    # ADVICE r4: write_index previously dropped bounds_exact, so an
    # incrementally-updated index reloaded from disk silently regained
    # exact-bounds status — stale build-time max_score under grown
    # n_docs could then wrongly prune blocks if a pruning path is on.
    from groonga_spark.index.checkpoint import read_index, write_index

    v1, _, old_docs, new_docs = v1_v2
    idx1 = build_index(v1, ["content"], tokenizer="code", n_pbuckets=8)
    upd = apply_update(idx1, old_docs, new_docs, n_pbuckets=8)
    assert upd.bounds_exact is False
    write_index(upd, str(tmp_path / "upd_idx"))
    reloaded = read_index(spark, str(tmp_path / "upd_idx"))
    assert reloaded.bounds_exact is False
    # a fresh build round-trips as exact
    write_index(idx1, str(tmp_path / "v1_idx"))
    assert read_index(spark, str(tmp_path / "v1_idx")).bounds_exact is True
