"""A/B the block-max WAND disjunctive top-k at N docs: same engine, same
OR queries, WAND forced on (cutoff -1) vs prune off, interleaved reps,
medians per arm.

Query mix:
  or_rare_head   — rare term OR head term: θ lands at the rare scores, the
                   BMW cell bound should cut the head decode to ~rare cells
  or_mid_head    — mid-df OR head
  or_head_head   — two head terms: θ below both maxima, prune ≈ no-op →
                   measures pure gate overhead
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from groonga_spark.corpus import corpus_df
from groonga_spark.query import engine as eng_mod
from groonga_spark.query.engine import SearchEngine
from groonga_spark.session import get_spark

N_DOCS = int(os.environ.get("WAND_DOCS", "1000000"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("WAND_REPS", "3"))

spark = get_spark("wand_ab", cores=CORES)
spark.sparkContext.setLogLevel("ERROR")

corpus = corpus_df(spark, N_DOCS, n_partitions=max(CORES, 8)).persist()
corpus.count()
t0 = time.perf_counter()
eng = SearchEngine.build(corpus, ["content"], tokenizer="code")
eng.index.persist()
print(f"build {time.perf_counter()-t0:.1f}s", file=sys.stderr)

from pyspark.sql import functions as F

dic = eng.index.dictionary.filter(F.col("term").rlike("^[a-z][a-z0-9_]{2,}$"))
head = dic.orderBy(F.desc("df")).limit(2).collect()
rare = dic.filter((F.col("df") >= 50) & (F.col("df") <= 500)).orderBy("term").limit(1).collect()
mid = dic.filter(
    (F.col("df") >= N_DOCS // 100) & (F.col("df") <= N_DOCS // 20)
).orderBy("term").limit(1).collect()
h1, h2 = head[0]["term"], head[1]["term"]
r1 = rare[0]["term"]
m1 = mid[0]["term"] if mid else h2
print(
    "terms:",
    {t["term"]: t["df"] for t in head + rare + mid},
    file=sys.stderr,
)

QUERIES = {
    "or_rare_head": f"{r1} OR {h1}",
    "or_mid_head": f"{m1} OR {h1}",
    "or_head_head": f"{h1} OR {h2}",
}

eng.select(h2, k=10, escalate=False).count()  # warmup

res = {q: {"on": [], "off": []} for q in QUERIES}
for rep in range(REPS):
    for name, q in QUERIES.items():
        arms = ("on", "off") if rep % 2 == 0 else ("off", "on")
        for arm in arms:
            eng_mod.WAND_OR_CUTOFF = -1 if arm == "on" else 10**18
            t0 = time.perf_counter()
            eng.select(q, k=10, escalate=False).count()
            res[name][arm].append(round(time.perf_counter() - t0, 3))

med = lambda xs: sorted(xs)[len(xs) // 2]
out = {
    "metric": "block-max WAND A/B (median of %d interleaved reps)" % REPS,
    "n_docs": N_DOCS,
    "cores": CORES,
    "queries": {
        name: {
            "wand_on_s": med(v["on"]),
            "wand_off_s": med(v["off"]),
            "speedup": round(med(v["off"]) / max(med(v["on"]), 1e-9), 2),
            "raw": v,
        }
        for name, v in res.items()
    },
}
print(json.dumps(out))
