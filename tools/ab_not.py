"""A/B the AND_NOT membership-only negative decode (NEG_DOCS_ONLY) vs the
scored-decode path: same prebuilt index, same NOT queries (rare -head /
head -head / mid -mid), interleaved reps, medians, rank identity asserted
between arms every rep.

Run: PYTHONPATH=. python tools/ab_not.py   (expects the
tools/bench_query_scaling.py --build index, env QS_DOCS to match)
Env: NOT_REPS (3), QS_DOCS (1000000), SPARK_GRAFT_CPUS (32).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from groonga_spark.index.checkpoint import read_index
from groonga_spark.query import engine as eng_mod
from groonga_spark.query.engine import SearchEngine
from groonga_spark.session import get_spark

N_DOCS = int(os.environ.get("QS_DOCS", "1000000"))
REPS = int(os.environ.get("NOT_REPS", "3"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
INDEX = os.environ.get("QS_INDEX", f"/tmp/qscaling_index_{N_DOCS}")

spark = get_spark("not_ab", cores=CORES)
spark.sparkContext.setLogLevel("ERROR")
eng = SearchEngine(read_index(spark, INDEX))

dic = eng.index.dictionary.filter(F.col("term").rlike("^[a-z][a-z0-9_]{2,}$"))
ranked = [
    r["term"]
    for r in dic.filter(F.col("df") >= 20).orderBy(F.desc("df"), F.asc("term")).limit(2000).collect()
]
head1, head2 = ranked[0], ranked[1]
mid1, mid2 = ranked[len(ranked) // 2], ranked[len(ranked) // 2 + 1]
rare = ranked[-1]
QUERIES = {
    "rare_not_head": f"{rare} -{head1}",
    "head_not_head": f"{head1} -{head2}",
    "mid_not_mid": f"{mid1} -{mid2}",
}

eng.select(head1, k=10, escalate=False).count()  # warmup

res = {q: {"docs_only": [], "scored": []} for q in QUERIES}
ranks = {}
for rep in range(REPS):
    arms = ("docs_only", "scored") if rep % 2 == 0 else ("scored", "docs_only")
    for arm in arms:
        eng_mod.NEG_DOCS_ONLY = arm == "docs_only"
        for qname, q in QUERIES.items():
            t0 = time.perf_counter()
            rows = [tuple(r) for r in eng.select(q, k=10, escalate=False).collect()]
            res[qname][arm].append(round(time.perf_counter() - t0, 3))
            key = (qname, arm)
            if qname in ranks:
                assert ranks[qname] == rows, f"rank mismatch {key}"
            else:
                ranks[qname] = rows
        print(f"rep{rep} {arm}: " + " ".join(f"{q}={res[q][arm][-1]}" for q in QUERIES), file=sys.stderr)
eng_mod.NEG_DOCS_ONLY = True

med = lambda xs: sorted(xs)[len(xs) // 2]
out = {
    "metric": "AND_NOT membership-only negative decode A/B (median of %d interleaved reps)" % REPS,
    "n_docs": N_DOCS,
    "cores": CORES,
    "rank_identical": True,
    "queries": {
        q: {
            "docs_only_s": med(v["docs_only"]),
            "scored_s": med(v["scored"]),
            "speedup": round(med(v["scored"]) / max(med(v["docs_only"]), 1e-9), 2),
            "raw": v,
        }
        for q, v in res.items()
    },
}
print(json.dumps(out))
