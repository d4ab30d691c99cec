"""Distributed BPE (ops/bpe.py) vs a pure-Python reference implementation
of the published algorithm (Sennrich et al., ACL'16) with identical
tie-breaking — merge sequences and encodings must be identical."""

import pytest


def _ref_train(word_counts: dict[str, int], n_merges: int, min_count: int = 2):
    words = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple, int] = {}
        for w, syms in words.items():
            wc = word_counts[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + wc
        if not counts:
            break
        # max count, ties lexicographic (a asc, b asc)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w, syms in words.items():
            acc, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    acc.append(a + b)
                    i += 2
                else:
                    acc.append(syms[i])
                    i += 1
            words[w] = acc
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wider wide wide low",
    "the new low deal",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_training_matches_reference(spark, docs):
    from groonga_spark.ops.bpe import train_bpe

    wc: dict[str, int] = {}
    for t in TEXTS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = _ref_train(wc, 10)
    got = train_bpe(docs, n_merges=10)
    assert got == want
    assert len(got) > 3  # the corpus supports several merges


def test_encode_applies_merges_greedily(spark, docs):
    from groonga_spark.ops.bpe import bpe_encode, train_bpe

    merges = train_bpe(docs, n_merges=10)
    out = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    toks1, n1 = out[1]
    assert n1 == len(toks1)
    # every token is either a learned merge product or a base symbol
    joined = "".join(toks1).replace("</w>", " ").strip()
    assert joined == "low lower lowest low low"
    # frequent whole word 'low</w>' should have merged into one token
    assert "low</w>" in toks1


def test_batched_equals_sequential_on_disjoint_top_pairs(spark):
    # corpus engineered so each round's top pairs are symbol-disjoint and
    # no merge-created pair reaches min_count: 10 distinct words carrying
    # 'ab' once (unique flanks), 9 carrying 'cd' — batched selection must
    # reproduce the sequential merge list exactly
    from groonga_spark.ops.bpe import train_bpe

    w_ab = [chr(0x3B1 + i) + "ab" + chr(0x400 + i) for i in range(10)]
    w_cd = [chr(0x500 + i) + "cd" + chr(0x600 + i) for i in range(9)]
    df = spark.createDataFrame(
        [(1, " ".join(w_ab + w_cd))], "doc_id long, text string"
    )
    seq = train_bpe(df, n_merges=2, batch_merges=1)
    bat = train_bpe(df, n_merges=2, batch_merges=4)
    assert seq == [("a", "b"), ("c", "d")]
    assert bat == seq


def test_batched_defers_conflicting_pairs(spark):
    # 'ababab': (a,b) and (b,a) share a symbol — the batch must defer
    # (b,a) rather than co-select it; here deferral keeps the batched
    # list identical to sequential for the full run
    from groonga_spark.ops.bpe import train_bpe

    df = spark.createDataFrame(
        [(1, "ababab ababab ababab")], "doc_id long, text string"
    )
    seq = train_bpe(df, n_merges=4, batch_merges=1)
    bat = train_bpe(df, n_merges=4, batch_merges=2)
    assert bat == seq
    assert seq[0] == ("a", "b")
    assert ("b", "a") not in seq


def test_batched_deterministic(spark, docs):
    from groonga_spark.ops.bpe import train_bpe

    a = train_bpe(docs, n_merges=8, batch_merges=8)
    b = train_bpe(docs, n_merges=8, batch_merges=8)
    assert a == b
    assert len(a) == 8
    # every selected batch is disjoint → the flat list never repeats a pair
    assert len(set(a)) == len(a)


def test_encode_empty_and_missing(spark):
    from groonga_spark.ops.bpe import bpe_encode

    df = spark.createDataFrame([(1, ""), (2, "zz")], "doc_id long, text string")
    out = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, [("z", "z")]).collect()}
    assert out[1] == []
    assert out[2] == ["zz", "</w>"]
