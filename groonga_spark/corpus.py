"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Generator is seeded (seed=42 by default), wall-clock-free, and cheap enough
to synthesize 100k+ docs for the bench.  Content mixes ``def fn(...)`` lines,
snake_case/camelCase identifiers from a Zipf-weighted vocabulary, numbers,
operators and string literals, plus *planted phrases* in known docs so
phrase/NEAR expectations are exact.
"""

from __future__ import annotations

import hashlib

import numpy as np

LANGS = ["py", "c", "js", "java", "go"]

# planted phrases (multi-token after bigram tokenization)
PLANTED = [
    "quick brown fox jumps",
    "lazy dog sleeps",
    "merge sort partition",
]

_STEMS = [
    "get", "set", "run", "load", "save", "parse", "build", "merge", "split",
    "index", "query", "token", "block", "chunk", "score", "rank", "term",
    "doc", "list", "map", "hash", "tree", "node", "edge", "path", "file",
    "read", "write", "open", "close", "init", "free", "alloc", "copy",
    "move", "swap", "find", "scan", "seek", "push", "pop", "peek", "emit",
    "flush", "commit", "abort", "retry", "batch", "stream", "buffer",
    "cache", "table", "column", "row", "key", "value", "count", "total",
    "limit", "offset", "filter", "sort", "group", "join", "union", "slice",
]


def _vocab(n_stems: int = 2000, seed: int = 42) -> list[str]:
    rng = np.random.default_rng(seed)
    base = list(_STEMS)
    while len(base) < n_stems:
        a = _STEMS[rng.integers(0, len(_STEMS))]
        b = _STEMS[rng.integers(0, len(_STEMS))]
        suf = int(rng.integers(0, 100))
        base.append(f"{a}{b.capitalize()}{suf if suf < 10 else ''}")
    return base[:n_stems]


_VOCAB_CACHE: dict[tuple[int, int], tuple[list[str], "np.ndarray"]] = {}


def _vocab_probs(seed: int, n_stems: int = 2000):
    key = (seed, n_stems)
    if key not in _VOCAB_CACHE:
        vocab = _vocab(n_stems, seed)
        ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
        probs = 1.0 / ranks
        probs /= probs.sum()
        _VOCAB_CACHE[key] = (vocab, probs)
    return _VOCAB_CACHE[key]


def doc_row(i: int, seed: int = 42) -> tuple[str, str, str, str, str]:
    """One deterministic row — **per-doc seeded** RNG (seed sequence
    (seed, i)), so distributed generation yields identical content
    regardless of partitioning."""
    vocab, probs = _vocab_probs(seed)
    nv = len(vocab)
    rng = np.random.default_rng([seed, i])
    repo = f"org{i % 13}/proj{i % 7}"
    lang = LANGS[i % len(LANGS)]
    path = f"src/module_{i % 29}/file_{i}.{lang}"
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
    n_lines = int(rng.integers(4, 30))
    lines = []
    for _ in range(n_lines):
        kind = int(rng.integers(0, 5))
        w = [vocab[j] for j in rng.choice(nv, size=int(rng.integers(2, 6)), p=probs)]
        if kind == 0:
            lines.append(f"def {w[0]}_{w[1]}({', '.join(w[2:])}):")
        elif kind == 1:
            lines.append(f"    {w[0]}_{w[1]} = {w[-1]}({int(rng.integers(0, 9999))})")
        elif kind == 2:
            camel = w[0] + "".join(x.capitalize() for x in w[1:3])
            lines.append(f"    return {camel} + \"{w[-1]}\"")
        elif kind == 3:
            lines.append(f"    if {w[0]} > {int(rng.integers(0, 100))}: {w[1]} -= 1")
        else:
            lines.append(f"# {' '.join(w)}")
    if i % 17 == 0:
        lines.append(f"# {PLANTED[i % len(PLANTED)]}")
    content = "\n".join(lines)[:4000]
    return (repo, path, commit, lang, content)


def make_corpus_rows(n_docs: int, seed: int = 42) -> list[tuple[str, str, str, str, str]]:
    """Rows ``(repo, path, commit, lang, content)``, deterministic."""
    return [doc_row(i, seed) for i in range(n_docs)]


def corpus_df(spark, n_docs: int, seed: int = 42, n_partitions: int | None = None):
    """Corpus DataFrame with dense ``doc_id`` (grn_id analogue, lib/db.c:1163
    — row_number over (repo, path)) and the ``content_sha`` invariant.

    Generation is DISTRIBUTED: a ``spark.range`` over doc indices is mapped
    through the per-doc-seeded generator on the executors — no driver-side
    row list, no serial pickle of the corpus into the plan.  At 10^12 files
    the same shape works unchanged (range → mapInPandas)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from .ids import assign_dense_ids

    n_partitions = n_partitions or max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_docs, numPartitions=n_partitions)
    cols = ["repo", "path", "commit", "lang", "content"]

    def gen(it):
        for pdf in it:
            rows = [doc_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    df = base.mapInPandas(
        gen, "repo string, path string, commit string, lang string, content string"
    )
    df = assign_dense_ids(df, ["repo", "path"], "doc_id")
    # REBALANCE after the id window: its exchange hash-partitions on the
    # bucket id (≤ n_partitions distinct values into shuffle.partitions
    # slots), which leaves most output partitions empty and a few holding
    # whole buckets — every downstream stage then runs at the speed of one
    # fat partition regardless of cores (measured: stage-T p50 0.4s,
    # max 110s).  Round-robin into small uniform slices restores
    # wave-level parallelism for tokenize and the tf cache.
    df = df.repartition(n_partitions * 4)
    return df.withColumn(
        "content_sha", F.sha2(F.col("content").cast("binary"), 256)
    )
