"""Read-path cost of append-only delta commits (the LSM trade's other
half, r5).  `ab_layout_1m.json` measured the WRITE side: append-only
commits are 9.9x cheaper than a rebuild.  The open question it left is
what those deferred deletes cost READERS between compactions: every
query on a block-rows index with pending doc tombstones pays the
broadcast metadata range-join that builds the per-block ``_excl`` mask
(read_index_block_rows), plus the decode-time mask itself.

Protocol: build the base index (N docs), write block-rows, then apply
K append-only commits (each replacing a DISJOINT 0.1% doc slice —
doc_id %% 1000 == i).  At depths 0, 1, K/2, K measure the same top-k
BM25 queries (median of R reps each, warm session) through a freshly
loaded index; then ``compact()`` (timed, bytes counted) and measure
again.  The claim under test: query drag grows slowly with stacked
commits (tombstones are churn-proportional broadcasts) and compaction
restores fresh-index latency — i.e. "append-only commits for churn,
compact on a cadence" is a usable serving recipe, not just a write win.

Run: PYTHONPATH=. python tools/bench_blockrows_read.py
Env: BRR_DOCS (default 1_000_000), BRR_COMMITS (8), BRR_REPS (3).
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from groonga_spark.corpus import corpus_df
from groonga_spark.index import blockrows
from groonga_spark.index.build import build_index
from groonga_spark.query.engine import SearchEngine
from groonga_spark.session import get_spark

N_DOCS = int(os.environ.get("BRR_DOCS", "1000000"))
K_COMMITS = int(os.environ.get("BRR_COMMITS", "8"))
REPS = int(os.environ.get("BRR_REPS", "3"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROOT = f"/tmp/gs_brr_{N_DOCS}"

QUERIES = {"q_single": "index", "q_and": "merge sort", "q_or": "filter OR union"}

spark = get_spark("bench_blockrows_read", cores=CORES)
spark.sparkContext.setLogLevel("ERROR")

corpus = corpus_df(spark, N_DOCS, n_partitions=max(CORES, 8)).persist()
corpus.count()
t0 = time.perf_counter()
idx = build_index(corpus, ["content"], tokenizer="code").persist()
print(f"base build {time.perf_counter()-t0:.1f}s", file=sys.stderr)

shutil.rmtree(ROOT, ignore_errors=True)
os.makedirs(ROOT)
blockrows.write_index_block_rows(idx, ROOT)


def dir_bytes_since(path: str, t0: float) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for fn in files:
            try:
                st = os.stat(os.path.join(dirpath, fn))
            except OSError:
                continue
            if st.st_mtime >= t0:
                total += st.st_size
    return total


def measure_queries() -> dict:
    """Load the index fresh (the serving shape: a reader opens the table,
    commits land between loads) and run each query REPS times, median."""
    eng = SearchEngine(blockrows.read_index_block_rows(spark, ROOT))
    out = {}
    for name, q in QUERIES.items():
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            eng.select(q, k=10, escalate=False).collect()
            ts.append(time.perf_counter() - t0)
        out[name] = round(sorted(ts)[len(ts) // 2], 3)
    return out


med = lambda xs: sorted(xs)[len(xs) // 2]
depths = sorted({0, 1, K_COMMITS // 2, K_COMMITS})
by_depth: dict[str, dict] = {}
commit_secs = []
done = 0
for depth in depths:
    while done < depth:
        # each commit replaces a disjoint 0.1% slice: doc_id % 1000 == done
        old = corpus.filter(F.col("doc_id") % 1000 == done)
        new = old.withColumn(
            "content", F.concat(F.lit(f"rev{done} "), F.col("content"))
        )
        t0 = time.perf_counter()
        blockrows.commit_update(ROOT, old, new, mode="append_only")
        commit_secs.append(round(time.perf_counter() - t0, 2))
        done += 1
        print(f"commit {done}: {commit_secs[-1]}s", file=sys.stderr)
    by_depth[str(depth)] = measure_queries()
    print(f"depth {depth}: {by_depth[str(depth)]}", file=sys.stderr)

t0w = time.time()
t0 = time.perf_counter()
blockrows.compact(ROOT)
compact_s = round(time.perf_counter() - t0, 2)
compact_bytes = dir_bytes_since(ROOT, t0w)
post_compact = measure_queries()
print(f"compact: {compact_s}s, post: {post_compact}", file=sys.stderr)

fresh = by_depth[str(depths[0])]
deepest = by_depth[str(depths[-1])]
out = {
    "metric": (
        f"block-rows read latency vs stacked append-only commits "
        f"({N_DOCS} docs, {K_COMMITS} x 0.1%-churn commits, "
        f"median of {REPS} reps per query, one warm session)"
    ),
    "n_docs": N_DOCS,
    "cores": CORES,
    "driver_mem": os.environ.get("SPARK_DRIVER_MEM", "8g"),
    "query_sec_by_commit_depth": by_depth,
    "commit_secs": commit_secs,
    "compact_s": compact_s,
    "compact_bytes": compact_bytes,
    "query_sec_post_compact": post_compact,
    "drag_at_max_depth": {
        q: round(deepest[q] / max(fresh[q], 1e-9), 2) for q in QUERIES
    },
    "post_compact_vs_fresh": {
        q: round(post_compact[q] / max(fresh[q], 1e-9), 2) for q in QUERIES
    },
}
print(json.dumps(out))
