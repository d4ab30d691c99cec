"""Scale-path dedup operators must stay EXACT while avoiding the r1
scale-killers: the prefix-filtered jaccard join must equal the naive
all-shingles join even on a corpus dominated by one boilerplate shingle,
and the banded 60-bit simhash join must equal brute-force hamming."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def boiler_docs(spark):
    # every doc shares a license-header shingle ("spdx license identifier
    # apache") — the r1 naive join exploded quadratically on it
    rows = []
    for i in range(1, 61):
        body = f"unique{i} words number{i} appear here token{i}"
        if i % 3 == 0:
            body = f"unique{i} words number{i} appear here token{i - 1}"
        rows.append((i, f"spdx license identifier apache {body}"))
    # planted dups: 101 is an exact copy of 100 (guaranteed to share every
    # LSH band), 102 differs by one trailing word (usually a candidate,
    # but the deterministic md5 draw may miss it — covered by the
    # kept == want equivalence, not asserted individually)
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta iota extra"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta theta iota extra"))
    rows.append((102, "alpha beta gamma delta epsilon zeta eta theta iota"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _naive_jaccard(spark, df, k, threshold):
    from groonga_spark.ops.dedup import word_shingles

    sh = (
        word_shingles(df, "text", k)
        .select(F.col("doc_id").alias("id"), F.explode("shingles").alias("s"))
        .distinct()
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "s")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sa"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sb"), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_prefix_filter_jaccard_exact(spark, boiler_docs, threshold):
    from groonga_spark.ops.dedup import ngram_jaccard_pairs

    got = {
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(boiler_docs, k=3, threshold=threshold).collect()
    }
    want = {
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in _naive_jaccard(spark, boiler_docs, 3, threshold).collect()
    }
    assert got == want
    assert (100, 101, 1.0) in got  # identical docs
    assert any(a == 100 and b == 102 for a, b, _ in got)  # J = 8/9 pair


def test_banded_simhash_equals_bruteforce(spark, boiler_docs):
    from groonga_spark.ops.dedup import simhash60, simhash_dup_pairs

    got = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_dup_pairs(boiler_docs, max_hamming=3, n_bands=4).collect()
    }
    s = simhash60(boiler_docs)
    rows = {r["id"]: r["simhash"] for r in s.collect()}
    want = set()
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(rows[a] ^ rows[b]).count("1")
            if h <= 3:
                want.add((a, b, h))
    assert got == want
    assert all(0 <= rows[i] < (1 << 60) for i in rows)


def test_banded_simhash_rejects_unsound_params(spark, boiler_docs):
    from groonga_spark.ops.dedup import simhash_dup_pairs

    with pytest.raises(ValueError):
        simhash_dup_pairs(boiler_docs, max_hamming=4, n_bands=4)


def test_dedup_documents_exact(spark):
    from groonga_spark.ops.dedup import dedup_documents

    df = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "different"),
         (4, "same text here")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup_documents(df, method="exact").collect())
    assert kept == [1, 3]


def test_dedup_documents_minhash_greedy_by_id(spark, boiler_docs):
    from groonga_spark.ops.dedup import (
        dedup_documents,
        minhash_candidate_pairs,
        ngram_jaccard_pairs,
    )

    t = 0.5
    kept = {
        r["doc_id"]
        for r in dedup_documents(
            boiler_docs, method="minhash", threshold=t, k=3, n_bands=4, r=2
        ).collect()
    }
    # expected: drop every doc that pairs (J >= t) with a smaller id AND
    # was an LSH candidate
    cand = {
        (r["a"], r["b"])
        for r in minhash_candidate_pairs(boiler_docs, n_bands=4, k=3, r=2).collect()
    }
    true_pairs = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(boiler_docs, k=3, threshold=t).collect()
    }
    drop = {b for (a, b) in (cand & true_pairs)}
    want = {r["doc_id"] for r in boiler_docs.collect()} - drop
    assert kept == want
    assert 101 not in kept and 100 in kept  # exact copy always dropped


def test_rolling_fingerprints_vectorized(spark):
    from groonga_spark.ops.textstats import rolling_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # identical
            (3, "completely different content here"),
            (4, "tiny"),  # shorter than the window → whole-doc hash
            (5, ""),
            (6, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fingerprint"] for r in rolling_fingerprints(docs).collect()}
    assert out[1] == out[2]  # deterministic
    assert out[1] != out[3]
    assert out[4] == out[6]
    assert out[5] == 0
    # reference value: min over 32-byte-window polynomial hashes mod 2^64
    text = "the quick brown fox jumps over the lazy dog"
    b = text.encode()
    w = 32
    best = min(
        sum(b[i + j] * pow(1000003, w - 1 - j, 1 << 64) for j in range(w)) % (1 << 64)
        for i in range(len(b) - w + 1)
    )
    want = best - (1 << 64) if best >= 1 << 63 else best
    assert out[1] == want
