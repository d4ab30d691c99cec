"""In-session A/B of POS_CAND_MASK (candidate masking inside the phase-2
positional decode) at 1M docs: same engine, alternating arms, medians."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from groonga_spark.corpus import corpus_df
from groonga_spark.query import engine as eng_mod
from groonga_spark.query.engine import SearchEngine
from groonga_spark.session import get_spark

N_DOCS = int(os.environ.get("ANCHOR_DOCS", "1000000"))
REPS = int(os.environ.get("ANCHOR_REPS", "3"))

spark = get_spark("posmask_ab", cores=32)
spark.sparkContext.setLogLevel("ERROR")
corpus = corpus_df(spark, N_DOCS, n_partitions=32).persist()
corpus.count()
t0 = time.perf_counter()
eng = SearchEngine.build(corpus, ["content"], tokenizer="code")
eng.index.persist()
print(f"build {time.perf_counter()-t0:.1f}s", file=sys.stderr)

QUERIES = {
    "phrase_head3": '"merge sort partition"',
    "near_head2": "*N5 merge partition",
    "phrase_head2": '"merge sort"',
}
eng.select("index", k=10, escalate=False).count()  # warmup

res = {q: {"mask": [], "blocks": []} for q in QUERIES}
for rep in range(REPS):
    for name, q in QUERIES.items():
        arms = ("mask", "blocks") if rep % 2 == 0 else ("blocks", "mask")
        for arm in arms:
            eng_mod.POS_CAND_MASK = arm == "mask"
            t0 = time.perf_counter()
            eng.select(q, k=10, escalate=False).count()
            res[name][arm].append(round(time.perf_counter() - t0, 3))

med = lambda xs: sorted(xs)[len(xs) // 2]
print(json.dumps({
    "metric": "phase-2 candidate masking A/B (median of %d reps)" % REPS,
    "n_docs": N_DOCS,
    "queries": {
        n: {
            "mask_s": med(v["mask"]),
            "blocks_s": med(v["blocks"]),
            "speedup": round(med(v["blocks"]) / max(med(v["mask"]), 1e-9), 2),
            "raw": v,
        }
        for n, v in res.items()
    },
}))
