"""Adjudicate the two out-of-band BENCH_r04 moves (r4 verdict #5):
`simhash_q` 1.19 → 1.78 s and `lsh_index_build` 2.93 → 3.95 s vs r3,
with NO commit touching either path — presumed host-window noise.

Protocol: same sf0.1 / local[32] shapes as bench.py, N interleaved reps
per target with a CONTROL entry (`dedup_exact`, also untouched, known
stable) timed in the same loop; medians reported next to the r3/r4
values.  If the targets' medians return to the r3 band while the
control matches its own history, the r4 numbers were host noise; a
genuine regression would reproduce here.

Run: PYTHONPATH=. python tools/recheck_r4_outliers.py
Env: RCK_REPS (default 5), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("RCK_REPS", "5"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from groonga_spark.session import get_spark  # noqa: E402

spark = get_spark("recheck_outliers", cores=CORES)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry  # noqa: E402

qs = entry.queries()
HISTORY = {  # from BENCH_r03/BENCH_r04 (same protocol)
    "simhash_q": {"r3": 1.19, "r4": 1.78},
    "lsh_index_build": {"r3": 2.93, "r4": 3.95},
    "dedup_exact": {"r3": 0.62, "r4": 0.73},  # control
}


def run_simhash():
    qs["simhash_q"](spark, SF_DIR).count()


def run_lsh_build():
    entry._ENGINES.pop(SF_DIR + "#lsh", None)  # force a cold build
    entry._lsh_index(spark, SF_DIR)


def run_control():
    qs["dedup_exact"](spark, SF_DIR).count()


ARMS = {
    "simhash_q": run_simhash,
    "lsh_index_build": run_lsh_build,
    "dedup_exact": run_control,
}

# warmup (session costs out of rep0)
for fn in ARMS.values():
    fn()

res = {a: [] for a in ARMS}
order = list(ARMS)
for rep in range(REPS):
    seq = order if rep % 2 == 0 else order[::-1]
    for a in seq:
        t0 = time.perf_counter()
        ARMS[a]()
        res[a].append(round(time.perf_counter() - t0, 3))
        print(f"rep{rep} {a}: {res[a][-1]}s", file=sys.stderr)

med = lambda xs: sorted(xs)[len(xs) // 2]
print(
    json.dumps(
        {
            "metric": (
                f"r4 bench-outlier recheck (median of {REPS} interleaved "
                "reps, warm session, control included)"
            ),
            "sf_dir": SF_DIR,
            "cores": CORES,
            "results": {
                a: {"median_s": med(v), "raw": v, **HISTORY.get(a, {})}
                for a, v in res.items()
            },
        }
    )
)
