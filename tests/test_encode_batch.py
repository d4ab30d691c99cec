"""_encode_batch (the vectorized stage-P kernel) against a plain
re-implementation of the per-group spec (merge_hit_blocks semantics,
ii.c:7578-7676). Pure pandas/numpy — no SparkSession."""

import numpy as np
import pandas as pd
import pytest

from groonga_spark import encoding, scoring
from groonga_spark.index.build import BLOCK_SIZE, _encode_batch


def _ref_group(term, pbucket, salt, df, docs, sids, tfs, dls, pos, n_docs, avgdl):
    """Straight-line reference: one block at a time, per-field encode."""
    n = len(docs)
    if df < 0:
        df = int((np.diff(docs) != 0).sum()) + 1 if n else 0
    idf = scoring.idf(n_docs, df)
    blocks = []
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        b_docs = docs[s:e]
        deltas = np.diff(b_docs, prepend=b_docs[0]).astype(np.uint32)
        tf_enc = (tfs[s:e] - 1).astype(np.uint32)
        enc = 0
        if encoding.choose_encoding(e - s, int(deltas.max())) == "pfor":
            enc |= 1
            doc_b = encoding.pfor_encode(deltas)
        else:
            doc_b = encoding.vb_encode(deltas)
        if encoding.choose_encoding(e - s, int(tf_enc.max())) == "pfor":
            enc |= 2
            tf_b = encoding.pfor_encode(tf_enc)
        else:
            tf_b = encoding.vb_encode(tf_enc)
        tfc = [
            scoring.tf_component(float(tfs[i]), float(dls[i]), avgdl[int(sids[i])])
            for i in range(s, e)
        ]
        blocks.append(
            {
                "first_doc_id": int(b_docs[0]),
                "last_doc_id": int(b_docs[-1]),
                "n": e - s,
                "enc": enc,
                "doc_deltas": bytes(doc_b),
                "sids": bytes(encoding.vb_encode((sids[s:e] - 1).astype(np.uint32))),
                "tfs": bytes(tf_b),
                "dls": bytes(encoding.vb_encode(dls[s:e].astype(np.uint32))),
                "pos_deltas": b"".join(pos[s:e]),
                "max_tf": int(tfs[s:e].max()),
                "max_score": idf * max(tfc),
            }
        )
    return {
        "term": term, "pbucket": pbucket, "bucket": salt, "df": df,
        "n_postings": n, "blocks": blocks,
    }


@pytest.fixture()
def frame():
    """Three groups: tiny (2 postings), multi-block heavy (300 postings,
    broadcast df), multi-sid docs."""
    rng = np.random.default_rng(7)
    rows = []
    # group 1: light term, df sentinel -1
    rows += [
        ("alpha", 3, 0, -1, 5, 1, 2, 10, b"\x01"),
        ("alpha", 3, 0, -1, 9, 1, 1, 4, b"\x02"),
    ]
    # group 2: heavy term (broadcast df=300), 300 postings -> 3 blocks
    docs = np.sort(rng.choice(100000, size=300, replace=False))
    for d in docs:
        rows.append(("beta", 7, 2, 300, int(d), 1, int(rng.integers(1, 40)), 50, b"\x03\x04"))
    # group 3: multi-sid (2 sections), same doc twice
    rows += [
        ("gamma", 1, 0, -1, 11, 1, 3, 7, b"\x05"),
        ("gamma", 1, 0, -1, 11, 2, 1, 9, b""),
        ("gamma", 1, 0, -1, 12, 2, 2, 8, b"\x06"),
    ]
    return pd.DataFrame(
        rows, columns=["term", "pbucket", "salt", "df", "doc_id", "sid", "tf", "dl", "pos_bytes"]
    )


AVGDL = {1: 25.0, 2: 12.0}
N_DOCS = 1000


class TestEncodeBatch:
    def test_matches_reference(self, frame):
        got = _encode_batch(frame, N_DOCS, AVGDL)
        assert [g["term"] for g in got] == ["alpha", "beta", "gamma"]
        for g in got:
            sub = frame[(frame["term"] == g["term"])]
            ref = _ref_group(
                g["term"],
                int(sub["pbucket"].iat[0]),
                int(sub["salt"].iat[0]),
                int(sub["df"].iat[0]) if int(sub["df"].iat[0]) >= 0 else -1,
                sub["doc_id"].to_numpy(np.int64),
                sub["sid"].to_numpy(np.int64),
                sub["tf"].to_numpy(np.int64),
                sub["dl"].to_numpy(np.int64),
                sub["pos_bytes"].tolist(),
                N_DOCS,
                AVGDL,
            )
            assert g["df"] == ref["df"]
            assert g["n_postings"] == ref["n_postings"]
            assert len(g["blocks"]) == len(ref["blocks"])
            for gb, rb in zip(g["blocks"], ref["blocks"]):
                for k in ("first_doc_id", "last_doc_id", "n", "enc", "doc_deltas",
                          "sids", "tfs", "dls", "pos_deltas", "max_tf"):
                    assert gb[k] == rb[k], (g["term"], k)
                assert gb["max_score"] == pytest.approx(rb["max_score"], rel=1e-12)

    def test_in_group_df_counts_distinct_docs(self, frame):
        got = {g["term"]: g for g in _encode_batch(frame, N_DOCS, AVGDL)}
        assert got["alpha"]["df"] == 2
        assert got["gamma"]["df"] == 2  # doc 11 counted once across sids
        assert got["beta"]["df"] == 300  # broadcast value kept

    def test_heavy_group_blocks(self, frame):
        got = {g["term"]: g for g in _encode_batch(frame, N_DOCS, AVGDL)}
        beta = got["beta"]
        assert [b["n"] for b in beta["blocks"]] == [128, 128, 44]
        # block-relative decode round trip of doc ids
        docs = []
        for b in beta["blocks"]:
            if b["enc"] & 1:
                deltas = encoding.pfor_decode(b["doc_deltas"], b["n"])
            else:
                deltas = encoding.vb_decode(b["doc_deltas"], b["n"])
            docs.extend((np.cumsum(deltas) + b["first_doc_id"]).tolist())
        sub = frame[frame["term"] == "beta"]["doc_id"].tolist()
        assert docs == sub


class _FakeConf:
    def get(self, key, default=None):
        assert key == "spark.sql.shuffle.partitions"
        return "32"


class _FakeSpark:
    conf = _FakeConf()


def test_encode_partitions_data_sized():
    """The (term, salt) exchange is sized by corpus tokens, never below
    the session's shuffle.partitions (scaling_2v8_4m_disk.json residual)."""
    from groonga_spark.index.build import ENCODE_PARTITION_TOKENS, encode_partitions

    spark = _FakeSpark()
    # small corpora keep the configured granularity
    assert encode_partitions(spark, 0) == 32
    assert encode_partitions(spark, 10_000) == 32
    assert encode_partitions(spark, 32 * ENCODE_PARTITION_TOKENS) == 32
    # past conf * tokens-per-task the count grows with data (ceil division)
    assert encode_partitions(spark, 32 * ENCODE_PARTITION_TOKENS + 1) == 33
    # 4M-doc corpus (~624M tokens) lands ~78 reduce tasks, not 8
    assert encode_partitions(spark, 624_000_000) == 78
