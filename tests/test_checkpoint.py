"""Checkpoint/resume: interrupted build resumes without recomputation and
serves identical query results (north-rule resumability requirement)."""

import os

import pytest

from oracle.pyoracle import OracleEngine, OracleIndex


def test_checkpoint_resume_and_query(spark, corpus, corpus_rows, tmp_path):
    from groonga_spark import SearchEngine
    from groonga_spark.index.checkpoint import (
        build_index_checkpointed,
        read_manifest,
        verify_lineage,
    )

    path = str(tmp_path / "idx")
    # interrupted build: only 2 of 4 waves complete
    out = build_index_checkpointed(
        corpus, ["content"], path, tokenizer="bigram",
        n_pbuckets=8, waves=4, max_waves=2,
    )
    assert out is None
    m1 = read_manifest(spark, path)
    done1 = m1.filter("stage = 'postings'").count()
    assert 0 < done1 < 8

    # resume: completes only the remaining buckets
    idx = build_index_checkpointed(
        corpus, ["content"], path, tokenizer="bigram", n_pbuckets=8, waves=4
    )
    assert idx is not None
    m2 = read_manifest(spark, path)
    assert m2.filter("stage = 'postings' and status = 'ok'").count() == 8
    # no bucket was rebuilt
    assert (
        m2.filter("stage = 'postings'")
        .groupBy("partition_id")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )

    # lineage invariant holds
    assert verify_lineage(corpus, path)

    # resumed index answers queries rank-identically to the oracle
    rows = [
        {"doc_id": i + 1, "content": r[4]}
        for i, r in enumerate(sorted(corpus_rows, key=lambda x: (x[0], x[1])))
    ]
    oracle = OracleEngine(OracleIndex.build(rows, ["content"], "bigram"))
    eng = SearchEngine(idx)
    got = [
        (r["doc_id"], r["score"])
        for r in eng.select("index query", k=10, escalate=False).collect()
    ]
    want = oracle.select("index query", k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9

    # a fully-built index is a no-op to "resume"
    idx2 = build_index_checkpointed(
        corpus, ["content"], path, tokenizer="bigram", n_pbuckets=8, waves=4
    )
    assert idx2 is not None
    m3 = read_manifest(spark, path)
    assert m3.filter("stage = 'postings'").count() == 8
