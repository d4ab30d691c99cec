"""A/B batched BPE training (batch_merges=m) vs sequential (m=1): same
corpus, same n_merges target, wall time per arm, interleaved reps,
medians — plus the merge-list agreement length (batched BPE is an
approximation; see ops/bpe.train_bpe docstring).

Run: PYTHONPATH=. python tools/ab_bpe.py
Env: BPE_DOCS (default 20000), BPE_MERGES (default 256), BPE_BATCH (8),
BPE_REPS (3).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groonga_spark.corpus import corpus_df
from groonga_spark.ops.bpe import train_bpe
from groonga_spark.session import get_spark

N_DOCS = int(os.environ.get("BPE_DOCS", "20000"))
N_MERGES = int(os.environ.get("BPE_MERGES", "256"))
BATCH = int(os.environ.get("BPE_BATCH", "8"))
REPS = int(os.environ.get("BPE_REPS", "3"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = get_spark("bpe_ab", cores=CORES)
spark.sparkContext.setLogLevel("ERROR")

corpus = corpus_df(spark, N_DOCS, n_partitions=max(CORES, 8)).persist()
corpus.count()

lists: dict[str, list] = {}
res = {"batched": [], "sequential": []}
for rep in range(REPS):
    arms = ("batched", "sequential") if rep % 2 == 0 else ("sequential", "batched")
    for arm in arms:
        m = BATCH if arm == "batched" else 1
        t0 = time.perf_counter()
        lists[arm] = train_bpe(corpus, text_col="content", n_merges=N_MERGES, batch_merges=m)
        res[arm].append(round(time.perf_counter() - t0, 3))
        print(f"rep{rep} {arm}(m={m}): {res[arm][-1]}s", file=sys.stderr)

agree = 0
for a, b in zip(lists["sequential"], lists["batched"]):
    if a != b:
        break
    agree += 1

# quality proxy (VERDICT r3 #5): batched BPE learns a DIFFERENT merge list
# (agreement prefix is usually tiny) — so report what actually matters:
# the encoded corpus size under each learned vocabulary.  Comparable token
# totals = comparable compression quality despite the divergent lists.
from pyspark.sql import functions as F

from groonga_spark.ops.bpe import bpe_encode

qual = {}
for arm in ("sequential", "batched"):
    enc = bpe_encode(
        corpus.withColumn("doc_id", F.monotonically_increasing_id()),
        lists[arm],
        text_col="content",
    )
    qual[arm] = int(enc.agg(F.sum("n_tokens")).collect()[0][0])

med = lambda xs: sorted(xs)[len(xs) // 2]
out = {
    "metric": "train_bpe batched vs sequential (median of %d interleaved reps)" % REPS,
    "n_docs": N_DOCS,
    "n_merges": N_MERGES,
    "batch_merges": BATCH,
    "cores": CORES,
    "batched_s": med(res["batched"]),
    "sequential_s": med(res["sequential"]),
    "speedup": round(med(res["sequential"]) / max(med(res["batched"]), 1e-9), 2),
    "merge_list_agreement_prefix": agree,
    "n_list_sequential": len(lists["sequential"]),
    "n_list_batched": len(lists["batched"]),
    "encoded_tokens_sequential": qual["sequential"],
    "encoded_tokens_batched": qual["batched"],
    "quality_ratio_batched_over_seq": round(
        qual["batched"] / max(qual["sequential"], 1), 4
    ),
    "raw": res,
}
print(json.dumps(out))
