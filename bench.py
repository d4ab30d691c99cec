"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE
JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Components measured:
  * ``index_build_documents`` — inverted-index build (tokenize → salted
    repartition-by-term → block encode) over the sf documents table,
    persisted; this is the engine every ft_* query then runs against.
  * ``corpus_build`` — same build over the synthetic source-code corpus
    (BASELINE.json input_hint shape, ``$SPARK_GRAFT_CORPUS_DOCS`` files,
    default 100k) with the code tokenizer; extra key ``files_per_sec``
    reports the authoritative build-throughput metric.
  * one timing per headline query (top-k BM25 through the index, set
    algebra, drilldown, dedup/similarity/textstats pipeline ops).

Scaling-efficiency evidence (north rule: >=0.8 from N to 4N) is produced by
``python bench.py --scaling``, which re-runs this harness in subprocesses at
N=local[4] and 4N=local[16] (interleaved, median of 3 — see run_scaling's
docstring and BASELINE.md "Measurement protocol" for why) and prints both
results plus the efficiency ratio.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR_DEFAULT = "/root/testdata/sf0.1"

# headline query names (keys of __spark_entry__.queries())
HEADLINE = [
    "ft_match_single",
    "ft_match_and",
    "ft_match_or",
    # ft_wand_or is deliberately NOT a headline row (VERDICT r4 item 7):
    # it forces on the demoted block-max WAND path (sentinel-off by
    # default after the planted-term crossover sweeps showed it losing at
    # every volume), so timing it in the headline added ~4 s of a
    # known-slower configuration to every round's total.  It remains a
    # correctness entry in queries()/oracle_sql() — the driver gate and
    # the local sf0.01 replica still verify its rank-identity every round.
    "ft_batch",
    "ft_match_not",
    "ft_phrase",
    "ft_prefix",
    "ft_near",
    "drilldown_lang",
    "setop_or",
    "scan_topn",
    "ref_deref",
    "dedup_exact",
    "minhash_pairs",
    "simhash_q",
    "simhash_pairs_q",
    "jaccard_pairs",
    "fingerprint_q",
    "dedup_near_q",
    "dedup_cc_q",
    "repetition_q",
    "decontam_q",
    "lm_bigram_q",
    "cosine_topk_q",
    "token_counts_q",
    "quality_q",
    "sample_strat_q",
    "sample_budget_q",
    "mix_weighted_q",
    "redact_q",
    "pack_q",
    "langid_trigram_q",
    # probe-only ANN / dedup-index queries (their one-time builds are
    # timed separately below as *_build rows)
    "ivf_topk_q",
    "lsh_probe_q",
    "ann_lsh_topk",
    "dedup_index_q",
]

# build-once index artifacts (build/query split): timed as their own rows
# so the probe-only query rows above never absorb a build
INDEX_BUILDS = {
    "ivf_index_build": "_ivf_index",
    "lsh_index_build": "_lsh_index",
}


def run_bench(sf_dir: str, cores: int, corpus_docs: int) -> dict:
    from groonga_spark.session import get_spark

    spark = get_spark("groonga_spark_bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    timings: dict[str, float] = {}
    total0 = time.perf_counter()
    lean = os.environ.get("SPARK_GRAFT_LEAN") == "1"  # corpus build only
    headline = [] if lean else HEADLINE

    if not lean:
        # -- index build over the sf documents table (engine for ft_*) -----
        t0 = time.perf_counter()
        entry._ENGINES.pop(sf_dir, None)
        entry._engine(spark, sf_dir)
        timings["index_build_documents"] = round(time.perf_counter() - t0, 3)

    # -- headline queries ----------------------------------------------------
    qs = entry.queries()
    if not lean:
        # build-once ANN index artifacts, timed as build rows; the probe
        # entries in HEADLINE then measure query-only against the cache
        for row, fn_name in INDEX_BUILDS.items():
            t0 = time.perf_counter()
            getattr(entry, fn_name)(spark, sf_dir)
            timings[row] = round(time.perf_counter() - t0, 3)
        # dedup_index_q builds its index inside the entry on first call:
        # time that first call as the build row, later probes are cached
        t0 = time.perf_counter()
        qs["dedup_index_q"](spark, sf_dir).count()
        timings["dedup_index_build"] = round(time.perf_counter() - t0, 3)
    if headline:
        # warmup: one untimed engine query so the first timed entry doesn't
        # absorb one-off session costs (python-worker spawn, first broadcast)
        qs[headline[0]](spark, sf_dir).count()
    for name in headline:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    # -- source-code corpus build throughput (files/sec) --------------------
    # runs LAST: its tf/corpus caches would otherwise evict the query
    # engine's cached index and distort the query latencies
    from groonga_spark.corpus import corpus_df
    from groonga_spark.index.build import build_index

    t0 = time.perf_counter()
    corpus = corpus_df(spark, corpus_docs, n_partitions=max(cores, 8)).persist()
    n_files = corpus.count()
    gen_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx = build_index(corpus, ["content"], tokenizer="code")
    idx.postings.write.mode("overwrite").parquet(
        f"/tmp/groonga_spark_bench_idx_{cores}"
    )
    build_s = time.perf_counter() - t0
    timings["corpus_build"] = round(build_s, 3)
    files_per_sec = round(n_files / build_s, 1)
    corpus.unpersist()

    total = round(time.perf_counter() - total0, 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "index-build + top-k BM25 query wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cores": cores,
        "corpus_files": n_files,
        "corpus_gen_sec": round(gen_s, 3),
        "files_per_sec": files_per_sec,
        "query_total_sec": round(sum(timings[n] for n in headline), 3) or None,
    }


def run_scaling(sf_dir: str, corpus_docs: int) -> None:
    """Same job at N and 4N cores; prints per-level results plus scaling
    efficiency on build throughput.

    Methodology (BASELINE.md "Measurement protocol"):
    - N=local[4] -> 4N=local[16] by default
      (``SPARK_GRAFT_SCALE_CORES=lo,hi`` overrides).  This sandbox is a
      shared VM: a hardware-ceiling experiment (independent python
      processes running the tokenize kernel, NO Spark) measures only ~0.63
      efficiency from 8 to 32 procs — per-process work inflates ~48% when
      all 32 vCPUs are busy (hypervisor steal / SMT / memory bandwidth).
      4 -> 16 stays below that saturation knee (~0.83 hardware ceiling),
      so it measures OUR job's scaling rather than the host's throttling.
    - Levels are interleaved (lo,hi,lo,hi,...) for ``SPARK_GRAFT_SCALE_REPS``
      rounds (default 3) and the per-level MEDIAN build throughput is used:
      single-shot wall times on this VM vary >60% run-to-run with
      neighbor load.
    """
    lo, hi = (
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_CORES", "4,16").split(",")
    )
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(reps):
        for cores in (lo, hi):
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cores),
                SPARK_GRAFT_SF_DIR=sf_dir,
                SPARK_GRAFT_CORPUS_DOCS=str(corpus_docs),
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            runs[cores].append(json.loads(out.stdout.strip().splitlines()[-1]))

    def med(vals: list[float]) -> float:
        s = sorted(vals)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0

    fps_lo = med([r["files_per_sec"] for r in runs[lo]])
    fps_hi = med([r["files_per_sec"] for r in runs[hi]])
    q_lo = q_hi = None
    if runs[lo][0].get("query_total_sec"):
        q_lo = round(med([len(HEADLINE) / r["query_total_sec"] for r in runs[lo]]), 3)
        q_hi = round(med([len(HEADLINE) / r["query_total_sec"] for r in runs[hi]]), 3)
    eff_build = (fps_hi / fps_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency N(local[{lo}]) -> 4N(local[{hi}])",
                "value": round(eff_build, 4),
                "unit": "efficiency",
                "build_files_per_sec": {"N": fps_lo, "4N": fps_hi},
                "query_qps": {"N": q_lo, "4N": q_hi},
                "reps": reps,
                "all_files_per_sec": {
                    str(c): [r["files_per_sec"] for r in runs[c]] for c in (lo, hi)
                },
                "runs": {str(c): runs[c][-1] for c in (lo, hi)},
            }
        )
    )


QSCALE_QUERIES = {
    # top-k BM25 over the synthetic source-code corpus (code tokenizer);
    # terms come from the corpus vocabulary, the phrase is PLANTED
    "q_single": "index",
    "q_and": "merge sort",
    "q_or": "filter OR union",
    "q_not": "query -token",
    "q_phrase": '"merge sort partition"',
    "q_near": "*N5 merge partition",
    "q_prefix": "sc*",
}


def run_qscale(cores: int) -> None:
    """Top-k BM25 query latency vs corpus size, one session: build the
    corpus index at each size in ``SPARK_GRAFT_QSCALE_SIZES`` (default
    ``100000,1000000``) and time the same query set against each.  The
    point is the GROWTH rate: with block-max pruning, the broadcast query
    path, and top-k short-circuits, latency should grow far slower than
    the corpus (the 100 TB query story), and this prints the measured
    ratio per query so BASELINE.md can cite it.
    """
    from groonga_spark.corpus import corpus_df
    from groonga_spark.query.engine import SearchEngine
    from groonga_spark.session import get_spark

    sizes = [
        int(x)
        for x in os.environ.get(
            "SPARK_GRAFT_QSCALE_SIZES", "100000,1000000"
        ).split(",")
    ]
    spark = get_spark("groonga_spark_qscale", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    per_size: dict[str, dict] = {}
    for n in sizes:
        corpus = corpus_df(spark, n, n_partitions=max(cores, 8)).persist()
        corpus.count()
        t0 = time.perf_counter()
        eng = SearchEngine.build(corpus, ["content"], tokenizer="code")
        eng.index.persist()
        build_s = time.perf_counter() - t0
        lat: dict[str, float] = {}
        eng.select(QSCALE_QUERIES["q_single"], k=10).count()  # warmup
        reps = int(os.environ.get("SPARK_GRAFT_QSCALE_REPS", "3"))
        raw: dict[str, list[float]] = {n: [] for n in QSCALE_QUERIES}
        for _ in range(reps):  # interleaved over the query set; median/query
            for name, q in QSCALE_QUERIES.items():
                t0 = time.perf_counter()
                eng.select(q, k=10, escalate=False).count()
                raw[name].append(round(time.perf_counter() - t0, 3))
        for name, xs in raw.items():
            lat[name] = sorted(xs)[len(xs) // 2]
        per_size[str(n)] = {
            "build_sec": round(build_s, 3),
            "files_per_sec": round(n / build_s, 1),
            "query_sec": lat,
        }
        eng.index.unpersist()
        corpus.unpersist()
    lo, hi = str(sizes[0]), str(sizes[-1])
    growth = {
        name: round(
            per_size[hi]["query_sec"][name] / per_size[lo]["query_sec"][name], 2
        )
        for name in QSCALE_QUERIES
    }
    print(
        json.dumps(
            {
                "metric": "top-k BM25 query latency vs corpus size",
                "value": round(
                    sum(growth.values()) / len(growth), 3
                ),
                "unit": f"mean latency ratio at {sizes[-1] // sizes[0]}x docs",
                "cores": cores,
                "sizes": sizes,
                "per_size": per_size,
                "latency_ratio": growth,
            }
        )
    )


def run_ceiling() -> None:
    """Measure the SANDBOX's parallel-scaling ceiling with plain python
    processes (no Spark, no shared state): each process runs the tokenize
    kernel on its own in-memory docs.  If N independent processes don't
    scale, no Spark job on this host can — this bounds what any
    --scaling measurement can show and justifies the N=4 -> 4N=16 choice.
    """
    import subprocess

    worker = (
        "import sys, time; sys.path.insert(0, %r); "
        "from groonga_spark.corpus import doc_row; "
        "from groonga_spark.tokenize import tokenize_batch; "
        "docs=[doc_row(i)[4] for i in range(4000)]; "
        "t0=time.perf_counter(); "
        "[tokenize_batch(docs, 'code') for _ in range(5)]; "
        "print(time.perf_counter()-t0)"
    ) % os.path.dirname(os.path.abspath(__file__))
    out = {}
    for nproc in (1, 4, 8, 16, 32):
        ps = [
            subprocess.Popen([sys.executable, "-c", worker], stdout=subprocess.PIPE)
            for _ in range(nproc)
        ]
        times = [float(p.communicate()[0]) for p in ps]
        out[str(nproc)] = round(nproc * 20000 / max(times), 0)
    e_8_32 = out["32"] / out["8"] / 4
    e_4_16 = out["16"] / out["4"] / 4
    print(
        json.dumps(
            {
                "metric": "hardware scaling ceiling (independent processes, no Spark)",
                "agg_docs_per_sec": out,
                "ceiling_eff_4_to_16": round(e_4_16, 3),
                "ceiling_eff_8_to_32": round(e_8_32, 3),
            }
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF_DIR_DEFAULT)
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_docs = int(os.environ.get("SPARK_GRAFT_CORPUS_DOCS", "100000"))
    if "--scaling" in sys.argv:
        run_scaling(sf_dir, corpus_docs)
        return
    if "--ceiling" in sys.argv:
        run_ceiling()
        return
    if "--qscale" in sys.argv:
        run_qscale(cores)
        return
    print(json.dumps(run_bench(sf_dir, cores, corpus_docs)))


if __name__ == "__main__":
    main()
