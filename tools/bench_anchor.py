"""A/B the anchor-driven block prune: same engine, same queries,
prune on vs off, interleaved reps (arm order alternates per rep),
medians per arm.  Env: ANCHOR_DOCS (default 1M), ANCHOR_REPS,
ANCHOR_SKIP (comma list of query names), SPARK_GRAFT_CPUS,
SPARK_DRIVER_MEM.  Artifacts recorded as anchor_ab_*.json; results
summarized in BASELINE.md "Anchor-driven block prune A/B".

Query mix: AND/phrase/NEAR pairs where one side is rare (anchor fires at
default gates) plus a no-anchor control (all-common AND) where the gate
should keep the prune OFF (times must match).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groonga_spark.corpus import corpus_df
from groonga_spark.query.engine import SearchEngine
from groonga_spark.session import get_spark

N_DOCS = int(os.environ.get("ANCHOR_DOCS", "1000000"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("ANCHOR_REPS", "3"))

spark = get_spark("anchor_ab", cores=CORES)
spark.sparkContext.setLogLevel("ERROR")

corpus = corpus_df(spark, N_DOCS, n_partitions=max(CORES, 8)).persist()
corpus.count()
t0 = time.perf_counter()
eng = SearchEngine.build(corpus, ["content"], tokenizer="code")
eng.index.persist()
print(f"build {time.perf_counter()-t0:.1f}s", file=sys.stderr)

# pick a genuinely rare term from the dictionary to pair with common ones
from pyspark.sql import functions as F

dic = eng.index.dictionary  # may not exist; fall back to term_meta probe
QUERIES = {
    "and_rare_common": None,  # filled below
    "and_common_common": "merge sort",
    "phrase_planted": '"merge sort partition"',
    "near_rare": None,
    "and_rare_two_common": None,
    "phrase_rare": None,
}
if os.environ.get("ANCHOR_SKIP"):
    for k in os.environ["ANCHOR_SKIP"].split(","):
        QUERIES.pop(k, None)

# find a term with df in [50, 500] (rare) and confirm 'index'/'merge' are common
meta = {
    r["term"]: r["df"]
    for r in dic.filter(
        F.col("term").isin(["index", "merge", "sort", "partition"])
    ).collect()
}
print("df:", meta, file=sys.stderr)
rare = (
    dic.filter((F.col("df") >= 50) & (F.col("df") <= 500))
    .orderBy("term")
    .limit(1)
    .collect()
)
rare_term = rare[0]["term"]
print("rare term:", rare_term, rare[0]["df"], file=sys.stderr)
for name, q in {
    "and_rare_common": f"{rare_term} index",
    "near_rare": f"*N10 {rare_term} index",
    "and_rare_two_common": f"{rare_term} index merge",
    "phrase_rare": f'"{rare_term} index"',
}.items():
    if name in QUERIES:
        QUERIES[name] = q
QUERIES = {k: v for k, v in QUERIES.items() if v is not None}

eng.select("index", k=10, escalate=False).count()  # warmup

res: dict[str, dict[str, list[float]]] = {
    q: {"on": [], "off": []} for q in QUERIES
}
for rep in range(REPS):
    for name, q in QUERIES.items():
        arms = ("on", "off") if rep % 2 == 0 else ("off", "on")
        for arm in arms:
            t0 = time.perf_counter()
            eng.select(q, k=10, escalate=False, prune=(arm == "on")).count()
            res[name][arm].append(round(time.perf_counter() - t0, 3))

med = lambda xs: sorted(xs)[len(xs) // 2]
out = {
    "metric": "anchor prune A/B (median of %d interleaved reps)" % REPS,
    "n_docs": N_DOCS,
    "cores": CORES,
    "queries": {
        name: {
            "prune_on_s": med(v["on"]),
            "prune_off_s": med(v["off"]),
            "speedup": round(med(v["off"]) / max(med(v["on"]), 1e-9), 2),
            "raw": v,
        }
        for name, v in res.items()
    },
}
print(json.dumps(out))
