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
    default 20k) with the code tokenizer; extra key ``files_per_sec``
    reports the authoritative build-throughput metric.
  * one timing per headline query (top-k BM25 through the index, set
    algebra, drilldown, dedup/similarity/textstats pipeline ops).

Scaling-efficiency evidence (north rule: >=0.8 from N to 4N) is produced by
``python bench.py --scaling``, which re-runs this harness in subprocesses at
local[8] and local[32] and prints both results plus the efficiency ratio —
see BASELINE.md "Measurement protocol".
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
    "cosine_topk_q",
    "token_counts_q",
    "quality_q",
]


def run_bench(sf_dir: str, cores: int, corpus_docs: int) -> dict:
    from groonga_spark.session import get_spark

    spark = get_spark("groonga_spark_bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    timings: dict[str, float] = {}
    total0 = time.perf_counter()

    # -- index build over the sf documents table (engine for ft_* queries) --
    t0 = time.perf_counter()
    entry._ENGINES.pop(sf_dir, None)
    entry._engine(spark, sf_dir)
    timings["index_build_documents"] = round(time.perf_counter() - t0, 3)

    # -- headline queries ----------------------------------------------------
    qs = entry.queries()
    for name in HEADLINE:
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
        "query_total_sec": round(sum(timings[n] for n in HEADLINE), 3),
    }


def run_scaling(sf_dir: str, corpus_docs: int) -> None:
    """Same job at local[8] (N) and local[32] (4N); prints both JSON results
    plus scaling efficiency on build throughput."""
    results = {}
    for cores in (8, 32):
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
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
    n, n4 = results[8], results[32]
    eff_build = (n4["files_per_sec"] / n["files_per_sec"]) / 4.0
    thr_q_n = len(HEADLINE) / n["query_total_sec"]
    thr_q_4n = len(HEADLINE) / n4["query_total_sec"]
    print(
        json.dumps(
            {
                "metric": "scaling efficiency N(local[8]) -> 4N(local[32])",
                "value": round(eff_build, 4),
                "unit": "efficiency",
                "build_files_per_sec": {"N": n["files_per_sec"], "4N": n4["files_per_sec"]},
                "query_qps": {"N": round(thr_q_n, 3), "4N": round(thr_q_4n, 3)},
                "runs": results,
            }
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF_DIR_DEFAULT)
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_docs = int(os.environ.get("SPARK_GRAFT_CORPUS_DOCS", "20000"))
    if "--scaling" in sys.argv:
        run_scaling(sf_dir, corpus_docs)
        return
    print(json.dumps(run_bench(sf_dir, cores, corpus_docs)))


if __name__ == "__main__":
    main()
