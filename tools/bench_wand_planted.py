"""Find the measured crossover of the block-max pruning paths with
CONTROLLED posting volumes (r3 verdict #1): plant terms of exact df into
every document so a single build yields OR queries spanning summed-df
~400k → 6M, then A/B each path (forced on vs off, interleaved medians):

  * block-max WAND on pure-OR top-k     (WAND_OR_CUTOFF)
  * single-term covering-prefix prune   (SINGLE_TERM_PRUNE_CUTOFF)
  * anchor-driven positional prune      (phrase/NEAR; ANCHOR_PRUNE_*)

Planted suffix per doc (code tokenizer keeps each as one term):
  zzrare   df = N/10000   (appended when doc_id % 10000 == 0)
  zzmilli  df = N/1000
  zzdecile df = N/10
  zzhalf   df = N/2
  zzcommon df = N         (always; always LAST, so "zzmilli zzcommon" is
                           an adjacent phrase exactly on the %1000 docs)

Run: PYTHONPATH=. python tools/bench_wand_planted.py
Env: PLANT_DOCS (default 4_000_000), PLANT_REPS (3), SPARK_GRAFT_CPUS.
Output: one JSON line with per-query on/off medians, speedups, and the
estimated decoded-postings volume of each query (the cutoff currency).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from groonga_spark.corpus import corpus_df
from groonga_spark.query import engine as eng_mod
from groonga_spark.query.engine import SearchEngine
from groonga_spark.session import get_spark

# snapshot the engine's ACTUAL defaults before the sweep mutates them —
# hardcoding restore values here silently re-enabled pruning paths when
# the engine's shipped defaults changed (sentinel-off demotion)
_SAVED_GATES = {
    k: getattr(eng_mod, k)
    for k in (
        "WAND_OR_CUTOFF",
        "SINGLE_TERM_PRUNE_CUTOFF",
        "ANCHOR_PRUNE_CUTOFF",
        "ANCHOR_PRUNE_RATIO",
    )
}

N_DOCS = int(os.environ.get("PLANT_DOCS", "4000000"))
REPS = int(os.environ.get("PLANT_REPS", "3"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = get_spark("wand_planted", cores=CORES)
spark.sparkContext.setLogLevel("ERROR")

base = corpus_df(spark, N_DOCS, n_partitions=max(CORES, 8))
planted = base.withColumn(
    "content",
    F.concat(
        F.col("content"),
        F.when(F.col("doc_id") % 10000 == 0, F.lit(" zzrare")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 1000 == 0, F.lit(" zzmilli")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 10 == 0, F.lit(" zzdecile")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0, F.lit(" zzhalf")).otherwise(F.lit("")),
        F.lit(" zzcommon"),
    ),
).persist()
planted.count()

t0 = time.perf_counter()
eng = SearchEngine.build(planted, ["content"], tokenizer="code")
eng.index.persist()
build_s = round(time.perf_counter() - t0, 1)
print(f"build {build_s}s at {N_DOCS} docs", file=sys.stderr)

dfs = {
    r["term"]: int(r["df"])
    for r in eng.index.dictionary.filter(
        F.col("term").startswith("zz")
    ).collect()
}
print("planted dfs:", dfs, file=sys.stderr)

# ---- experiment matrix -----------------------------------------------------
# each entry: (label, query, gate-variable, est decoded postings when OFF)
WAND = [
    ("or_milli_common", "zzmilli OR zzcommon"),
    ("or_milli_half", "zzmilli OR zzhalf"),
    ("or_milli_decile", "zzmilli OR zzdecile"),
    ("or_common_half", "zzcommon OR zzhalf"),  # theta can't prune: overhead
]
SINGLE = [
    ("single_common", "zzcommon"),
    ("single_half", "zzhalf"),
    ("single_decile", "zzdecile"),
]
POS = [
    ("phrase_milli_common", '"zzmilli zzcommon"'),
    ("near_milli_common", "*N10 zzmilli zzcommon"),  # *N<k> NEAR pragma
]


def est_postings(q):
    return sum(dfs.get(t, 0) for t in q.replace('"', "").replace("*N10 ", "").replace(" OR ", " ").split())


def run(q):
    t0 = time.perf_counter()
    eng.select(q, k=10, escalate=False).count()
    return round(time.perf_counter() - t0, 3)


eng.select("zzdecile", k=10, escalate=False).count()  # warmup

OFF = 10**18
results = {}
only = os.environ.get("PLANT_GROUPS")  # e.g. "single,wand" to subset
sel_groups = set(only.split(",")) if only else None
for group, entries, gates_on, gates_off in (
    ("wand", WAND, {"WAND_OR_CUTOFF": -1}, {"WAND_OR_CUTOFF": OFF}),
    (
        "single",
        SINGLE,
        {"SINGLE_TERM_PRUNE_CUTOFF": -1},
        {"SINGLE_TERM_PRUNE_CUTOFF": OFF},
    ),
    (
        "pos_anchor",
        POS,
        # force every anchor gate open: cutoff -1 passes `rest > cutoff`,
        # ratio 0 passes `a_df * ratio <= rest`
        {"ANCHOR_PRUNE_CUTOFF": -1, "ANCHOR_PRUNE_RATIO": 0},
        {"ANCHOR_PRUNE_CUTOFF": OFF, "ANCHOR_PRUNE_RATIO": 4},
    ),
):
    if sel_groups is not None and group not in sel_groups:
        continue
    for name, q in entries:
        res = {"on": [], "off": []}
        for rep in range(REPS):
            arms = ("on", "off") if rep % 2 == 0 else ("off", "on")
            for arm in arms:
                for k, v in (gates_on if arm == "on" else gates_off).items():
                    setattr(eng_mod, k, v)
                res[arm].append(run(q))
        for k, v in gates_off.items():
            setattr(eng_mod, k, v)
        med = lambda xs: sorted(xs)[len(xs) // 2]
        results[name] = {
            "group": group,
            "query": q,
            "est_decoded_postings_off": est_postings(q),
            "on_s": med(res["on"]),
            "off_s": med(res["off"]),
            "speedup_on": round(med(res["off"]) / max(med(res["on"]), 1e-9), 2),
            "raw": res,
        }
        print(name, results[name]["on_s"], results[name]["off_s"],
              results[name]["speedup_on"], file=sys.stderr)

# restore the pre-sweep defaults so nothing leaks if this module is reused
for _k, _v in _SAVED_GATES.items():
    setattr(eng_mod, _k, _v)

out = {
    "metric": "planted-term block-max pruning crossover A/B "
    f"(median of {REPS} interleaved reps)",
    "n_docs": N_DOCS,
    "cores": CORES,
    "build_s": build_s,
    "planted_dfs": dfs,
    "results": results,
}
print(json.dumps(out))
