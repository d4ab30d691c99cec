"""QUERY-path scaling evidence: the same 32-query select_batch job over
the SAME prebuilt 1M-doc index at two parallelism levels (default
local[2] -> local[8], the range below this VM's saturation knee — see
BASELINE.md "Measurement protocol").  Complements bench.py --scaling,
which measures BUILD throughput; the north rule asks for scaling on the
query metric too.

Protocol: build once (subprocess, 32 cores) -> write_index; then
interleaved reps (lo,hi,lo,hi,...) of a fresh-JVM subprocess per arm
that read_index()s and times ONE batched top-k action; per-level MEDIAN
wall time; efficiency = (t_lo / t_hi) / (hi / lo).

Run: PYTHONPATH=. python tools/bench_query_scaling.py
Env: QS_DOCS (1000000), QS_CORES ("2,8"), QS_REPS (3), QS_Q (32),
     QS_INDEX (/tmp/qscaling_index).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("QS_DOCS", "1000000"))
LO, HI = (int(x) for x in os.environ.get("QS_CORES", "2,8").split(","))
REPS = int(os.environ.get("QS_REPS", "3"))
N_Q = int(os.environ.get("QS_Q", "32"))
INDEX = os.environ.get("QS_INDEX", f"/tmp/qscaling_index_{N_DOCS}")


def _queries(eng) -> dict[str, str]:
    """32 mixed flat queries (term / AND / OR over head..mid terms) —
    deterministic for a given index (df-desc, term tie-break)."""
    from pyspark.sql import functions as F

    dic = eng.index.dictionary.filter(F.col("term").rlike("^[a-z][a-z0-9_]{2,}$"))
    terms = [
        r["term"]
        for r in dic.filter(F.col("df") >= 20)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(64)
        .collect()
    ]
    queries: dict[str, str] = {}
    for i in range(N_Q):
        a, b = terms[i % len(terms)], terms[(i * 7 + 3) % len(terms)]
        if i % 3 == 0:
            queries[f"q{i}"] = a
        elif i % 3 == 1:
            queries[f"q{i}"] = f"{a} {b}" if a != b else a
        else:
            queries[f"q{i}"] = f"{a} OR {b}" if a != b else a
    return queries


def build() -> None:
    from groonga_spark.corpus import corpus_df
    from groonga_spark.index.checkpoint import write_index
    from groonga_spark.query.engine import SearchEngine
    from groonga_spark.session import get_spark

    spark = get_spark("qscaling_build", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = corpus_df(spark, N_DOCS, n_partitions=32).persist()
    corpus.count()
    eng = SearchEngine.build(corpus, ["content"], tokenizer="code")
    write_index(eng.index, INDEX)
    print("built", file=sys.stderr)


def arm(cores: int) -> None:
    from groonga_spark.index.checkpoint import read_index
    from groonga_spark.query.engine import SearchEngine
    from groonga_spark.session import get_spark

    spark = get_spark(f"qscaling_{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    eng = SearchEngine(read_index(spark, INDEX))
    queries = _queries(eng)
    first = next(iter(queries.values())).split()[0]
    eng.select(first, k=10, escalate=False).count()  # JVM/codegen warmup
    t0 = time.perf_counter()
    n = eng.select_batch(queries, k=10).count()
    print(json.dumps({"cores": cores, "batch_s": round(time.perf_counter() - t0, 3), "rows": n}))


def main() -> None:
    if "--build" in sys.argv:
        return build()
    if "--arm" in sys.argv:
        return arm(int(sys.argv[sys.argv.index("--arm") + 1]))

    here = os.path.abspath(__file__)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(here)))
    if not os.path.exists(os.path.join(INDEX, "stats.json")):
        subprocess.run([sys.executable, here, "--build"], env=env, check=True)

    runs: dict[int, list[float]] = {LO: [], HI: []}
    for rep in range(REPS):
        for cores in (LO, HI):
            out = subprocess.run(
                [sys.executable, here, "--arm", str(cores)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            runs[cores].append(r["batch_s"])
            print(f"rep{rep} local[{cores}]: {r['batch_s']}s", file=sys.stderr)

    def med(vals: list[float]) -> float:
        s = sorted(vals)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0

    t_lo, t_hi = med(runs[LO]), med(runs[HI])
    print(
        json.dumps(
            {
                "metric": f"query-path scaling N(local[{LO}]) -> {HI // LO}N(local[{HI}])",
                "n_docs": N_DOCS,
                "n_queries": N_Q,
                "batch_s": {str(LO): t_lo, str(HI): t_hi},
                "qps": {
                    str(LO): round(N_Q / t_lo, 2),
                    str(HI): round(N_Q / t_hi, 2),
                },
                "efficiency": round((t_lo / t_hi) / (HI / LO), 4),
                "reps": REPS,
                "raw": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
