"""Structured-Streaming index maintenance (streaming.py): after each
micro-batch the persisted index answers queries rank-identically to a full
rebuild over the current document set."""

import pytest
from pyspark.sql import functions as F

from groonga_spark.index.build import build_index
from groonga_spark.query.engine import SearchEngine
from groonga_spark.streaming import StreamingIndexMaintainer

DOCS0 = [
    (1, "merge sort partition tree"),
    (2, "hash join build probe side"),
    (3, "sort order by key range"),
    (4, "block max score prune"),
]
BATCH1 = [  # replace 2, add 5
    (2, "bitmap index scan filter", "upsert"),
    (5, "merge join sort key order", "upsert"),
]
BATCH2 = [  # delete 3, replace 5
    (3, None, "delete"),
    (5, "vector search cosine top", "upsert"),
]


def _mk(spark, rows, with_op=False):
    if with_op:
        return spark.createDataFrame(
            [(i, t or "", op) for i, t, op in rows], "doc_id long, text string, _op string"
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ranks(engine, q="sort key", k=10):
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in engine.select(q, k=k, escalate=False).collect()
    ]


@pytest.fixture(scope="module")
def maintained(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream_idx"))
    m = StreamingIndexMaintainer(spark, root, ["text"], tokenizer="delimit")
    m.apply_batch(_mk(spark, DOCS0), batch_id=0)
    return m


class TestStreamingMaintenance:
    def test_initial_batch_builds(self, maintained):
        assert maintained.load_docs().count() == 4
        assert maintained.load_index().stats.n_docs == 4

    def test_upsert_and_delete_batches(self, spark, maintained):
        maintained.apply_batch(_mk(spark, BATCH1, with_op=True), batch_id=1)
        docs = {r["doc_id"]: r["text"] for r in maintained.load_docs().collect()}
        assert docs[2] == "bitmap index scan filter" and 5 in docs

        maintained.apply_batch(_mk(spark, BATCH2, with_op=True), batch_id=2)
        docs = {r["doc_id"]: r["text"] for r in maintained.load_docs().collect()}
        assert 3 not in docs and docs[5] == "vector search cosine top"
        assert maintained.load_index().stats.n_docs == 4  # 1,2,4,5

    def test_rank_identical_to_rebuild(self, spark, maintained):
        eng_inc = SearchEngine(maintained.load_index())
        idx_full = build_index(maintained.load_docs(), ["text"], "delimit")
        eng_full = SearchEngine(idx_full)
        for q in ("sort key", "merge", "cosine top", "scan filter"):
            assert _ranks(eng_inc, q) == _ranks(eng_full, q), q

    def test_replayed_batch_is_skipped(self, spark, maintained):
        before = {r["doc_id"]: r["text"] for r in maintained.load_docs().collect()}
        maintained.apply_batch(_mk(spark, BATCH1, with_op=True), batch_id=1)  # replay
        after = {r["doc_id"]: r["text"] for r in maintained.load_docs().collect()}
        assert before == after

    def test_real_stream_through_foreachBatch(self, spark, tmp_path):
        """End-to-end with an actual streaming source: file source feeding
        the sink; processAllAvailable drains it."""
        import json as _json
        import os

        src = tmp_path / "src"
        src.mkdir()
        with open(src / "b0.json", "w") as f:
            for i, t in DOCS0:
                f.write(_json.dumps({"doc_id": i, "text": t}) + "\n")
        root = str(tmp_path / "root")
        m = StreamingIndexMaintainer(spark, root, ["text"], tokenizer="delimit")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = m.sink(stream, checkpoint=str(tmp_path / "ckpt"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert m.load_docs().count() == 4
        eng = SearchEngine(m.load_index())
        assert len(_ranks(eng, "sort")) > 0

    def test_crash_mid_batch_replays_cleanly(self, spark, tmp_path):
        """A crash AFTER writing the new version dirs but BEFORE the
        state.json commit must leave the previous snapshot live; the
        replayed batch overwrites the orphan dirs and commits once."""
        import json as _json
        import os
        import shutil

        root = str(tmp_path / "crashroot")
        m = StreamingIndexMaintainer(spark, root, ["text"], tokenizer="delimit")
        b0 = spark.createDataFrame(DOCS0, "doc_id long, text string")
        m.apply_batch(b0.select("doc_id", "text"), 0)
        st1 = m._state()
        assert st1["version"] == 1

        # simulate the crashed attempt: half-written docs_v2 (garbage), no
        # index_v2, state.json NOT bumped
        os.makedirs(os.path.join(root, "docs_v2"))
        with open(os.path.join(root, "docs_v2", "_garbage"), "w") as f:
            f.write("partial write")

        # live snapshot still consistent
        assert m._state()["version"] == 1
        assert m.load_index().stats.n_docs == 4

        # replay the 'crashed' batch (an upsert of doc 1)
        b1 = spark.createDataFrame(
            [(1, "replayed content after crash")], "doc_id long, text string"
        )
        m.apply_batch(b1, 1)
        st2 = m._state()
        assert st2["version"] == 2 and st2["last_batch_id"] == 1
        docs = {r["doc_id"]: r["text"] for r in m.load_docs().collect()}
        assert docs[1] == "replayed content after crash"
        assert m.load_index().stats.n_docs == 4
        # stale version dirs cleaned after commit
        left = {d for d in os.listdir(root) if d.startswith(("docs_v", "index_v"))}
        assert left == {"docs_v2", "index_v2"}
