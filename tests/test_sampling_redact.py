"""Sampling / mixing / PII-redaction op unit tests.

The oracle replica (test_entry_oracle.py) already checks the sf0.01
driver entries against DuckDB; these tests pin the edge cases the
entries can't hit: the stratified prefilter's exactness fallback, groups
smaller than n, budget edge rows, and adversarial redaction inputs.
"""

import pytest
from pyspark.sql import functions as F

from groonga_spark.ops.redact import redact_pii
from groonga_spark.ops.sampling import (
    hash_sample,
    stratified_sample,
    token_budget_sample,
    weighted_mix,
)


@pytest.fixture(scope="module")
def docs(spark):
    # 3 groups of very different sizes: g0=200, g1=5, g2=1
    rows = [(i, "g0" if i < 200 else ("g1" if i < 205 else "g2"), 10 + i % 7)
            for i in range(206)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    return df.persist()


def _full_rank_sample(df, n, seed):
    """Reference: plain full-group window rank (what the oracle does)."""
    from pyspark.sql import Window
    from groonga_spark.ops.sampling import _hash60

    w = Window.partitionBy("source").orderBy(F.col("_h"), F.col("doc_id"))
    return (
        df.select("source", "doc_id", _hash60("doc_id", seed).alias("_h"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .select("source", "doc_id")
    )


def test_stratified_exact_vs_full_rank(docs):
    got = {tuple(r) for r in stratified_sample(docs, 7, seed="x").collect()}
    want = {tuple(r) for r in _full_rank_sample(docs, 7, "x").collect()}
    assert got == want
    # group smaller than n contributes all of its rows
    assert sum(1 for g, _ in got if g == "g1") == 5
    assert sum(1 for g, _ in got if g == "g2") == 1
    assert sum(1 for g, _ in got if g == "g0") == 7


def test_stratified_fallback_path_is_exact(docs):
    # oversample≈0 forces the prefilter to under-keep (threshold below
    # every hash w.h.p.) → every group takes the verified fallback; the
    # result must STILL equal the full-rank reference
    got = {
        tuple(r)
        for r in stratified_sample(docs, 3, seed="y", oversample=1e-12).collect()
    }
    want = {tuple(r) for r in _full_rank_sample(docs, 3, "y").collect()}
    assert got == want


def test_hash_sample_deterministic_and_disjoint(docs):
    a = {r.doc_id for r in hash_sample(docs, 0.3, seed="a").collect()}
    a2 = {r.doc_id for r in hash_sample(docs, 0.3, seed="a").collect()}
    b = {r.doc_id for r in hash_sample(docs, 0.3, seed="b").collect()}
    assert a == a2                      # same seed → identical sample
    assert a != b                       # different seed → different sample
    # rate=1 keeps everything, rate=0 keeps nothing
    assert hash_sample(docs, 1.0).count() == 206
    assert hash_sample(docs, 0.0).count() == 0
    # monotone: a lower-rate sample is a subset of a higher-rate one
    assert {r.doc_id for r in hash_sample(docs, 0.1, seed="a").collect()} <= a


def test_token_budget_boundary(docs):
    out = token_budget_sample(docs, budget=50, group_col="source", seed="z")
    rows = out.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.source, []).append(r)
    for g, rs in by_g.items():
        rs.sort(key=lambda r: r.cum_tokens)
        # every kept row STARTS before the budget: cum - tokens < 50
        assert all(r.cum_tokens - r.tokens < 50 for r in rs)
        # the last kept row crosses or ends at the budget unless the
        # group ran out of docs
        total_docs = docs.filter(F.col("source") == g).count()
        if len(rs) < total_docs:
            assert rs[-1].cum_tokens >= 50


def _plain_budget(df, budget, seed):
    """Reference: the pre-r3 implementation — running-total window over
    the FULL group (what the oracle SQL does)."""
    from pyspark.sql import Window

    from groonga_spark.ops.sampling import _hash60

    h = _hash60("doc_id", seed).alias("_h")
    hashed = df.select(
        "source", "doc_id", F.col("n_chars").cast("long").alias("_tok"), h
    )
    w = Window.partitionBy("source").orderBy("_h", "doc_id")
    prev = F.coalesce(
        F.sum("_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        hashed.withColumn("_prev", prev)
        .filter(F.col("_prev") < budget)
        .select(
            "source",
            "doc_id",
            F.col("_tok").alias("tokens"),
            (F.col("_prev") + F.col("_tok")).alias("cum_tokens"),
        )
    )


def test_token_budget_pool_bounded_on_dominant_group(spark):
    # one dominant source (20k docs) — the window input must be the
    # oversampled pool (~oversample·budget tokens), never the whole group
    rows = [(i, "big", 10) for i in range(20000)] + [
        (100000 + i, "small", 30) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    from groonga_spark.ops.sampling import _budget_pool, _hash60

    hashed = df.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("long").alias("_tok"),
        _hash60("doc_id", "sk").alias("_h"),
    )
    pool = _budget_pool(hashed, 100, "source", "doc_id", 4.0)
    counts = {
        r["source"]: r["n"]
        for r in pool.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # E[pool tokens] = 4·budget = 400 → ~40 docs of 10 tokens; assert a
    # generous bound far below the 20k-group size
    assert counts["big"] < 500
    # exactness vs the full-window reference
    got = {tuple(r) for r in token_budget_sample(df, 100, group_col="source", seed="sk").collect()}
    want = {tuple(r) for r in _plain_budget(df, 100, "sk").collect()}
    assert got == want


def test_token_budget_fallback_path_is_exact(docs):
    # oversample≈0 under-keeps every group → all groups take the verified
    # full fallback; result must still equal the full-window reference
    got = {
        tuple(r)
        for r in token_budget_sample(
            docs, 50, group_col="source", seed="z", oversample=1e-12
        ).collect()
    }
    want = {tuple(r) for r in _plain_budget(docs, 50, "z").collect()}
    assert got == want


def test_token_budget_matches_plain_window(docs):
    got = {
        tuple(r)
        for r in token_budget_sample(docs, 50, group_col="source", seed="z").collect()
    }
    want = {tuple(r) for r in _plain_budget(docs, 50, "z").collect()}
    assert got == want


def test_weighted_mix_rates(docs):
    out = weighted_mix(
        docs, weights={"g0": 1.0}, total_tokens=10**9, group_col="source"
    )
    rows = out.collect()
    # budget >> group tokens → rate caps at 1.0 and keeps ALL of g0
    assert all(r.rate == 1.0 for r in rows)
    assert {r.source for r in rows} == {"g0"}
    assert len(rows) == 200
    # absent groups get rate 0 → excluded entirely
    assert weighted_mix(
        docs, weights={"g2": 0.5}, total_tokens=1, group_col="source"
    ).filter(F.col("source") != "g2").count() == 0


def test_redact_pii_adversarial(spark):
    rows = [
        (0, "mail a.b-c_d%e@sub.domain.org end"),
        (1, "ip 10.0.0.1 and 255.255.255.255 but not 1.2.3.4.5 stop"),
        (2, "key " + "deadbeef" * 4 + " short " + "ab" * 15),
        (3, "plain text with no pii at all"),
        (4, "two me@a.io you@b.co emails"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[0].redacted == "mail <EMAIL> end"
    assert out[0].n_email == 1
    # 1.2.3.4.5: the regex matches the leading 1.2.3.4 (no lookahead in
    # the RE2-safe subset) — pinned so both engines agree
    assert out[1].n_ipv4 == 3
    assert "<IP> and <IP>" in out[1].redacted
    assert out[2].n_hexkey == 1 and "<KEY>" in out[2].redacted
    assert "ab" * 15 in out[2].redacted  # 30 hex chars < 32 → kept
    assert out[3].redacted == rows[3][1]
    assert out[3].n_email == out[3].n_ipv4 == out[3].n_hexkey == 0
    assert out[4].n_email == 2 and out[4].redacted == "two <EMAIL> <EMAIL> emails"
