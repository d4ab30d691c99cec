"""ANN build/query split tests: persisted IVF + LSH indexes.

The round-2 verdict flagged ivf_topk (per-query rebuild) and lsh_ann_topk
(full signature scan per query) as the remaining scale anti-patterns.
These tests pin the replacements:

* the IVF index is built once (centroids + assignment partitioned by
  ``_cell``) and queries are probe-only — full probe must equal the exact
  brute-force top-k, and the probed scan must show parquet
  PartitionFilters (no full-table read);
* the LSH index is a signature table partitioned by sig prefix; probe
  queries enumerate the Hamming ball driver-side, prune partitions, and
  match the on-the-fly multi-probe result exactly.
"""

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from groonga_spark.ops.similarity import (
    build_ivf_index,
    build_lsh_index,
    cosine_topk,
    hamming_ball,
    ivf_probe_topk,
    load_ivf_index,
    load_lsh_index,
    lsh_ann_topk,
    lsh_planes,
    lsh_probe_topk,
    _np_sigs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    df.count()
    return df


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def _qvec(emb, vid):
    return emb.filter(F.col("vec_id") == vid).select("embedding").collect()[0][0]


def test_hamming_ball():
    ball = hamming_ball(0b1010, 12, 2)
    assert len(ball) == 1 + 12 + 66  # Σ C(12, i≤2)
    assert len(set(ball)) == len(ball)
    assert all(bin(b ^ 0b1010).count("1") <= 2 for b in ball)
    assert hamming_ball(5, 8, 0) == [5]


def test_ivf_full_probe_equals_bruteforce(spark, emb, tmp_path):
    # probing ALL cells = exact search: must reproduce brute-force top-k
    idx = build_ivf_index(
        emb, path=str(tmp_path / "ivf"), n_cells=8, refine_iters=0, pinned=True
    )
    qv = _qvec(emb, 3)
    got = [
        (r.vec_id, round(r.cosine, 6))
        for r in ivf_probe_topk(idx, qv, k=10, n_probe=8, exclude_id=3).collect()
    ]
    want = [
        (r.vec_id, round(r.cosine, 6)) for r in cosine_topk(emb, 3, k=10).collect()
    ]
    assert got == want


def test_ivf_load_roundtrip_and_partition_pruning(spark, emb, tmp_path):
    p = str(tmp_path / "ivf2")
    idx = build_ivf_index(emb, path=p, n_cells=8, refine_iters=0, pinned=True)
    idx2 = load_ivf_index(spark, p, pinned=True)
    assert np.array_equal(idx.centroids, idx2.centroids)
    qv = _qvec(emb, 0)
    r1 = ivf_probe_topk(idx, qv, k=5, n_probe=2, exclude_id=0)
    r2 = ivf_probe_topk(idx2, qv, k=5, n_probe=2, exclude_id=0)
    assert [tuple(r) for r in r1.collect()] == [tuple(r) for r in r2.collect()]
    # the probe is a partition-pruned scan of its cells, not a full read
    plan = _plan(r2)
    assert "PartitionFilters" in plan
    assert "_cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_ivf_lloyd_refined_build_runs(spark, emb, tmp_path):
    # the quality path (Lloyd refinement) still builds + probes
    idx = build_ivf_index(emb, n_cells=4, refine_iters=2)
    qv = _qvec(emb, 1)
    out = ivf_probe_topk(idx, qv, k=5, n_probe=4, exclude_id=1).collect()
    want = [
        (r.vec_id, round(r.cosine, 6)) for r in cosine_topk(emb, 1, k=5).collect()
    ]
    assert [(r.vec_id, round(r.cosine, 6)) for r in out] == want


def test_lsh_probe_matches_on_the_fly(spark, emb, tmp_path):
    p = str(tmp_path / "lsh")
    idx = build_lsh_index(
        emb, path=p, n_planes=10, seed=7, pinned=True, prefix_bits=4
    )
    # driver-side query signature == the table's signature for that row
    qv = _qvec(emb, 5)
    qsig = int(_np_sigs(np.asarray(qv, dtype=np.float64)[None, :], idx.planes, True)[0])
    tbl_sig = idx.sigs.filter(F.col("id") == 5).select("sig").collect()[0][0]
    assert qsig == int(tbl_sig)

    got = lsh_probe_topk(idx, qv, k=8, max_probe_hamming=2, exclude_id=5)
    want = lsh_ann_topk(
        emb, 5, k=8, n_planes=10, seed=7, max_probe_hamming=2, pinned=True
    )
    assert [(r.vec_id, round(r.cosine, 6)) for r in got.collect()] == [
        (r.vec_id, round(r.cosine, 6)) for r in want.collect()
    ]
    plan = _plan(got)
    assert "PartitionFilters" in plan
    assert "_p" in plan.split("PartitionFilters", 1)[1][:200]

    # load roundtrip answers identically
    idx2 = load_lsh_index(spark, p)
    again = lsh_probe_topk(idx2, qv, k=8, max_probe_hamming=2, exclude_id=5)
    assert [tuple(r) for r in again.collect()] == [tuple(r) for r in got.collect()]


def test_pinned_and_matmul_sigs_agree_on_real_data(emb):
    # the matmul scale path and the pinned oracle path may differ bitwise
    # in the dot, but on real embeddings no plane dot sits at the knife
    # edge — signatures must agree (guards the pinned flag's semantics)
    m = np.asarray(
        [r[0] for r in emb.select("embedding").limit(200).collect()],
        dtype=np.float64,
    )
    planes = lsh_planes(m.shape[1], 12, 42)
    assert np.array_equal(_np_sigs(m, planes, True), _np_sigs(m, planes, False))
