"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline: the dot product and
norms are pure Column expressions (``aggregate``/``zip_with`` — JVM-side,
deterministic left-to-right summation so the DuckDB oracle matches bit-for-
bit after float32→float64 widening).  The scale path is LSH bucketing
(random-hyperplane signatures): candidates shrink from N to the probed
buckets, turning an O(N·d) scan per query into a bucket-pruned scan —
at 100 TB the signature table is partitioned by signature prefix."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from groonga_spark.ops.common import spread
from pyspark.sql.types import LongType


def _dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" 0D, (acc, v) -> acc + v)"
    )


def _norm_expr(a: str) -> str:
    return f"sqrt(aggregate({a}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))"


def cosine_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine to the row with ``id_col == query_vec_id``.
    The query row is broadcast (a 1-row cross join)."""
    q = df.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec")
    )
    cand = spread(df.filter(F.col(id_col) != query_vec_id)).crossJoin(
        F.broadcast(q)
    )
    cos = F.expr(_dot_expr(vec_col, "_qvec")) / (
        F.expr(_norm_expr(vec_col)) * F.expr(_norm_expr("_qvec"))
    )
    return (
        cand.withColumn("cosine", cos)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col), "cosine")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (a, b, cosine) for all
    a < b with cosine >= threshold.  The O(N²) self-join is the correctness
    baseline — at scale, run :func:`lsh_neardup_pairs` (bucketed candidates)
    and verify survivors with this expression."""
    a = spread(df).select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    cos = F.expr(_dot_expr("_va", "_vb")) / (
        F.expr(_norm_expr("_va")) * F.expr(_norm_expr("_vb"))
    )
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def lsh_neardup_pairs(
    df: DataFrame,
    threshold: float,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scale path for near-dup pairs: candidates = pairs sharing an LSH
    signature bucket (equi-join on sig — a shuffle hash join, not a cross
    join), verified with the exact cosine.  Recall < 1 by construction
    (approximate); raise recall with fewer planes or multi-band signatures."""
    sigs = lsh_signatures(df, n_planes, seed, vec_col, id_col)
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
    s = sigs.join(vecs, "id")
    left = s.select(F.col("id").alias("a"), F.col("sig"), F.col("_v").alias("_va"))
    right = s.select(F.col("id").alias("b"), F.col("sig"), F.col("_v").alias("_vb"))
    cos = F.expr(_dot_expr("_va", "_vb")) / (
        F.expr(_norm_expr("_va")) * F.expr(_norm_expr("_vb"))
    )
    return (
        left.join(right, "sig")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def _cell_assigner(cents_n: "np.ndarray"):
    """pandas UDF assigning each vector to its nearest (cosine) centroid —
    one broadcast matmul per Arrow batch."""

    @F.pandas_udf(LongType())
    def cell_udf(vs: pd.Series) -> pd.Series:
        m = np.asarray(vs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        return pd.Series(np.argmax(m @ cents_n.T, axis=1).astype(np.int64))

    return cell_udf


def kmeans_centroids(
    df: DataFrame,
    n_cells: int,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "np.ndarray":
    """Deterministic Lloyd refinement for IVF cells: init = the first
    ``n_cells`` vectors by id (reproducible), then ``n_iter`` iterations of
    assign (vectorized matmul UDF) → per-cell elementwise mean (posexplode
    + groupBy(cell, dim) avg — a shuffle of n_cells·dim tiny rows, never
    the vectors to the driver).  Empty cells keep their previous centroid.
    Returns the L2-normalized (n_cells, dim) array."""
    cent_rows = (
        df.filter(F.col(id_col) < n_cells).orderBy(id_col).select(vec_col).collect()
    )
    cents = np.asarray([r[0] for r in cent_rows], dtype=np.float64)
    cents_n = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
    for _ in range(n_iter):
        assigned = df.withColumn("_cell", _cell_assigner(cents_n)(F.col(vec_col)))
        rows = (
            assigned.select("_cell", F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .groupBy("_cell", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        nxt = cents_n.copy()
        by_cell: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cell.setdefault(int(r["_cell"]), {})[int(r["pos"])] = float(r["m"])
        for c, dims in by_cell.items():
            vec = np.array([dims[p] for p in sorted(dims)], dtype=np.float64)
            n = np.linalg.norm(vec)
            if n > 1e-30:
                nxt[c] = vec / n
        cents_n = nxt
    return cents_n


def ivf_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 20,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine_iters: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: deterministic Lloyd-refined centroids
    (:func:`kmeans_centroids` — seeded by the first n_cells vectors, so
    reproducible), every vector assigned to its nearest centroid (one
    broadcast matmul per Arrow batch), query probes the n_probe nearest
    cells and scores exactly inside them.  At scale the assignment is a
    build-time table partitioned by cell; a query touches
    n_probe/n_cells of the data."""
    cents_n = kmeans_centroids(df, n_cells, refine_iters, vec_col, id_col)

    assigned = df.withColumn("_cell", _cell_assigner(cents_n)(F.col(vec_col)))
    qrow = df.filter(F.col(id_col) == query_vec_id).select(vec_col).collect()
    qv = np.asarray(qrow[0][0], dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    probe = np.argsort(-(cents_n @ qn))[:n_probe].tolist()

    q = df.filter(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("_qvec"))
    cand = assigned.filter(
        F.col("_cell").isin([int(c) for c in probe]) & (F.col(id_col) != query_vec_id)
    )
    cos = F.expr(_dot_expr(vec_col, "_qvec")) / (
        F.expr(_norm_expr(vec_col)) * F.expr(_norm_expr("_qvec"))
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .withColumn("cosine", cos)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col), "cosine")
    )


def lsh_planes(dim: int, n_planes: int, seed: int = 42) -> "np.ndarray":
    """The (dim, n_planes) hyperplane matrix used by :func:`lsh_signatures`
    — exposed so oracles can embed the exact coefficients as SQL literals
    and replay the signatures engine-independently."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes))


def lsh_signatures(
    df: DataFrame,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """(id, sig) — random-hyperplane signature (sign bits of plane dots),
    planes drawn from a seeded RNG so the index is reproducible.  Vectorized
    pandas UDF; the dot product accumulates dimensions in ascending order
    (still one fused vector op per dim across the whole Arrow batch) so the
    float64 result — and therefore every sign bit — is bit-identical to a
    sequential left-to-right SQL ``list_sum`` replay."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = lsh_planes(dim, n_planes, seed)

    @F.pandas_udf(LongType())
    def sig_udf(vs: pd.Series) -> pd.Series:
        m = np.asarray(vs.tolist(), dtype=np.float64)  # (batch, dim)
        dots = np.zeros((len(vs), n_planes))
        for d in range(dim):  # pinned summation order (oracle-replayable)
            dots += m[:, d : d + 1] * planes[d]
        bits = dots > 0
        out = np.zeros(len(vs), dtype=np.int64)
        for j in range(n_planes):
            out |= bits[:, j].astype(np.int64) << j
        return pd.Series(out)

    return spread(df).select(
        F.col(id_col).alias("id"), sig_udf(F.col(vec_col)).alias("sig")
    )


def lsh_ann_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 20,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_probe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: score only vectors whose signature is within
    ``max_probe_hamming`` bits of the query signature (multi-probe LSH)."""
    sigs = lsh_signatures(df, n_planes, seed, vec_col, id_col)
    qsig = sigs.filter(F.col("id") == query_vec_id).select(
        F.col("sig").alias("_qsig")
    )
    cand_ids = (
        sigs.crossJoin(F.broadcast(qsig))
        .withColumn("_ham", F.bit_count(F.col("sig").bitwiseXOR(F.col("_qsig"))))
        .filter((F.col("_ham") <= max_probe_hamming) & (F.col("id") != query_vec_id))
        .select(F.col("id").alias(id_col))
    )
    cand = df.join(cand_ids, id_col)
    q = df.filter(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("_qvec"))
    cos = F.expr(_dot_expr(vec_col, "_qvec")) / (
        F.expr(_norm_expr(vec_col)) * F.expr(_norm_expr("_qvec"))
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .withColumn("cosine", cos)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col), "cosine")
    )
