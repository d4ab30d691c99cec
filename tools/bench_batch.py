"""A/B select_batch (one shared decode for a query SET) vs sequential
select() calls: Q mixed flat queries (term / AND / OR over head, mid and
rare terms), wall time per arm, interleaved reps, medians.

Run: PYTHONPATH=. python tools/bench_batch.py
Env: BATCH_DOCS (default 1000000), BATCH_Q (default 32), BATCH_REPS (3).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groonga_spark.corpus import corpus_df
from groonga_spark.query.engine import SearchEngine
from groonga_spark.session import get_spark

N_DOCS = int(os.environ.get("BATCH_DOCS", "1000000"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_Q = int(os.environ.get("BATCH_Q", "32"))
REPS = int(os.environ.get("BATCH_REPS", "3"))

spark = get_spark("batch_ab", cores=CORES)
spark.sparkContext.setLogLevel("ERROR")

corpus = corpus_df(spark, N_DOCS, n_partitions=max(CORES, 8)).persist()
corpus.count()
t0 = time.perf_counter()
eng = SearchEngine.build(corpus, ["content"], tokenizer="code")
eng.index.persist()
print(f"build {time.perf_counter()-t0:.1f}s", file=sys.stderr)

from pyspark.sql import functions as F

dic = eng.index.dictionary.filter(F.col("term").rlike("^[a-z][a-z0-9_]{2,}$"))
terms = [
    r["term"]
    for r in dic.filter(F.col("df") >= 20).orderBy(F.desc("df")).limit(64).collect()
]
MIX = os.environ.get("BATCH_MIX", "flat")  # flat | tree

queries: dict[str, str] = {}
if MIX == "tree":
    # positional / tree shapes: phrase, NOT, prefix, NEAR.  Phrases come
    # from ADJACENT token pairs of real docs so they actually match.
    pairs: list[tuple[str, str]] = []
    for row in corpus.limit(16).collect():
        toks, _ = eng._get_tokens(row["content"])
        for x, y in zip(toks, toks[1:]):
            if x != y and len(pairs) < 64:
                pairs.append((x, y))
    for i in range(N_Q):
        a, b = terms[i % len(terms)], terms[(i * 7 + 3) % len(terms)]
        pa, pb = pairs[i % len(pairs)]
        if i % 4 == 0:
            queries[f"q{i}"] = f'"{pa} {pb}"'
        elif i % 4 == 1:
            queries[f"q{i}"] = f"{a} -{b}" if a != b else a
        elif i % 4 == 2:
            queries[f"q{i}"] = a[:3] + "*"
        else:
            queries[f"q{i}"] = f"*N5 {a} {b}" if a != b else a
else:
    for i in range(N_Q):
        a, b = terms[i % len(terms)], terms[(i * 7 + 3) % len(terms)]
        if i % 3 == 0:
            queries[f"q{i}"] = a
        elif i % 3 == 1:
            queries[f"q{i}"] = f"{a} {b}" if a != b else a
        else:
            queries[f"q{i}"] = f"{a} OR {b}" if a != b else a

eng.select(terms[0], k=10, escalate=False).count()  # warmup

res = {"batch": [], "sequential": []}
for rep in range(REPS):
    arms = ("batch", "sequential") if rep % 2 == 0 else ("sequential", "batch")
    for arm in arms:
        t0 = time.perf_counter()
        if arm == "batch":
            n = eng.select_batch(queries, k=10).count()
        else:
            n = sum(
                eng.select(q, k=10, escalate=False).count()
                for q in queries.values()
            )
        res[arm].append(round(time.perf_counter() - t0, 3))
        print(f"rep{rep} {arm}: {res[arm][-1]}s ({n} rows)", file=sys.stderr)

med = lambda xs: sorted(xs)[len(xs) // 2]
out = {
    "metric": "select_batch vs sequential (median of %d interleaved reps)" % REPS,
    "mix": MIX,
    "n_docs": N_DOCS,
    "n_queries": N_Q,
    "cores": CORES,
    "batch_s": med(res["batch"]),
    "sequential_s": med(res["sequential"]),
    "speedup": round(med(res["sequential"]) / max(med(res["batch"]), 1e-9), 2),
    "raw": res,
}
print(json.dumps(out))
