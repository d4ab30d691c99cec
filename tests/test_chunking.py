"""Chunking / sequence-packing edge cases (the sf0.01 driver entries
cover the oracle replay; these pin window boundaries and the packing
invariants)."""

import pytest
from pyspark.sql import functions as F

from groonga_spark.ops.chunking import chunk_documents, pack_chunks


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, " ".join(f"w{i}" for i in range(5))),     # shorter than window
        (1, " ".join(f"w{i}" for i in range(8))),     # exactly one window
        (2, " ".join(f"w{i}" for i in range(9))),     # one token past → 2 chunks
        (3, " ".join(f"w{i}" for i in range(20))),    # several windows
        (4, "solo"),                                   # single token
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_boundaries(docs):
    # max_tokens=8, overlap=2 → stride 6
    ch = {
        (r.doc_id, r.chunk_no): r
        for r in chunk_documents(docs, max_tokens=8, overlap=2).collect()
    }
    counts = {}
    for (d, _), r in ch.items():
        counts[d] = counts.get(d, 0) + 1
    # 5 tokens → 1 chunk; 8 → 1; 9 → 1+ceil(1/6)=2; 20 → 1+ceil(12/6)=3
    assert counts == {0: 1, 1: 1, 2: 2, 3: 3, 4: 1}
    assert ch[(0, 0)].n_tokens == 5 and ch[(0, 0)].chunk == "w0 w1 w2 w3 w4"
    assert ch[(1, 0)].n_tokens == 8
    # second chunk of doc 2 starts at token 6 (overlap 2) and is short
    assert ch[(2, 1)].chunk == "w6 w7 w8" and ch[(2, 1)].n_tokens == 3
    # overlap: chunk 1 of doc 3 repeats tokens 6,7
    assert ch[(3, 0)].chunk.split()[-2:] == ["w6", "w7"]
    assert ch[(3, 1)].chunk.split()[:2] == ["w6", "w7"]
    assert ch[(3, 2)].n_tokens == 20 - 2 * 6
    assert ch[(4, 0)].chunk == "solo"


def test_chunk_rejects_bad_overlap(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=8, overlap=8)


def test_pack_invariants(docs):
    ch = chunk_documents(docs, max_tokens=8, overlap=2)
    packed = pack_chunks(ch, budget=10, n_streams=2).collect()
    assert len(packed) == ch.count()
    by_stream = {}
    for r in packed:
        by_stream.setdefault(r.stream, []).append(r)
    assert set(by_stream) <= {0, 1}
    for rows in by_stream.values():
        rows.sort(key=lambda r: (r.bin_id, r.offset))
        cum = 0
        for r in rows:
            # offset is the running total inside the bin; bin boundaries
            # advance exactly at budget multiples of the stream's cumsum
            assert r.bin_id == cum // 10
            assert r.offset == cum % 10
            cum += r.n_tokens
    # determinism: same input → identical packing
    again = pack_chunks(ch, budget=10, n_streams=2).collect()
    assert sorted(map(tuple, packed)) == sorted(map(tuple, again))
