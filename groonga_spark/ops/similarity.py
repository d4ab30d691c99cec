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


def _cos_col(a: str, b: str):
    """Cosine(a, b) as a Column.  The denominator is clamped at 1e-30 —
    the same guard as :func:`_np_cos_to_cents` and the DuckDB oracle's
    ``greatest(..., 1e-30)`` — so a zero vector yields cosine 0, not
    NaN/null; a bit-for-bit no-op for non-zero inputs."""
    return F.expr(_dot_expr(a, b)) / F.greatest(
        F.expr(_norm_expr(a)) * F.expr(_norm_expr(b)), F.lit(1e-30)
    )


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
    cos = _cos_col(vec_col, "_qvec")
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
    cos = _cos_col("_va", "_vb")
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
    pinned: bool = False,
) -> DataFrame:
    """Scale path for near-dup pairs: candidates = pairs sharing an LSH
    signature bucket (equi-join on sig — a shuffle hash join, not a cross
    join), verified with the exact cosine.  Recall < 1 by construction
    (approximate); raise recall with fewer planes or multi-band signatures."""
    sigs = lsh_signatures(df, n_planes, seed, vec_col, id_col, pinned=pinned)
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
    s = sigs.join(vecs, "id")
    left = s.select(F.col("id").alias("a"), F.col("sig"), F.col("_v").alias("_va"))
    right = s.select(F.col("id").alias("b"), F.col("sig"), F.col("_v").alias("_vb"))
    cos = _cos_col("_va", "_vb")
    return (
        left.join(right, "sig")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def _np_cos_to_cents(m: "np.ndarray", cents: "np.ndarray", pinned: bool) -> "np.ndarray":
    """(batch, n_cells) cosine of each row of ``m`` against each centroid.

    ``pinned=True`` accumulates every sum (dots and both squared norms) in
    ascending dimension order, so a SQL replay via sequential
    ``list_aggregate(..., 'sum')`` reproduces each cosine bit-for-bit —
    the same discipline as :func:`lsh_signatures`.  ``pinned=False`` is
    the scale path: one BLAS matmul per Arrow batch."""
    if pinned:
        dim = m.shape[1]
        nb = np.zeros(m.shape[0])
        nc = np.zeros(cents.shape[0])
        dots = np.zeros((m.shape[0], cents.shape[0]))
        for d in range(dim):
            nb += m[:, d] * m[:, d]
            nc += cents[:, d] * cents[:, d]
            dots += m[:, d : d + 1] * cents[:, d]
        # clamp like the matmul branch: a zero vector / centroid must give
        # cosine 0, not NaN (NaN would make np.argmax pick an arbitrary
        # cell and silently degrade probe ordering).  For non-zero inputs
        # the clamp is a no-op, so the bit-for-bit SQL replay (which
        # mirrors the same greatest(..., 1e-30)) is unaffected.
        return dots / np.maximum(np.sqrt(nb)[:, None] * np.sqrt(nc)[None, :], 1e-30)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
    return mn @ cn.T


def _cell_assigner(cents: "np.ndarray", pinned: bool = False):
    """pandas UDF assigning each vector to its nearest (cosine) centroid;
    ties take the lowest cell (np.argmax picks the first maximum, matching
    the oracle's ORDER BY cos DESC, cell)."""

    @F.pandas_udf(LongType())
    def cell_udf(vs: pd.Series) -> pd.Series:
        m = np.asarray(vs.tolist(), dtype=np.float64)
        cos = _np_cos_to_cents(m, cents, pinned)
        return pd.Series(np.argmax(cos, axis=1).astype(np.int64))

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


class IvfIndex:
    """A built IVF index: centroids (driver-side, n_cells·dim floats) +
    the cell-assigned vector table (partitioned by ``_cell`` when
    persisted).  The build/query split mirrors the repo's posting-index
    discipline — grn_ii_build (lib/ii.c:8029) builds once, grn_ii_select
    (ii.c:6319) only probes."""

    def __init__(self, centroids, assigned, vec_col, id_col, pinned):
        self.centroids = centroids
        self.assigned = assigned
        self.vec_col = vec_col
        self.id_col = id_col
        self.pinned = pinned


def build_ivf_index(
    df: DataFrame,
    path: str | None = None,
    n_cells: int = 16,
    refine_iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pinned: bool = False,
) -> IvfIndex:
    """Build the IVF index ONCE: choose centroids, assign every vector to
    its nearest cell (one vectorized pass), and — when ``path`` is given —
    write the assignment table partitioned by ``_cell`` plus a centroids
    table, then read it back so every query is a partition-pruned scan of
    its probed cells.

    ``refine_iters=0`` takes the first ``n_cells`` vectors (by id) as
    centroids verbatim — engine-independent, so a SQL oracle can rebuild
    the identical index from the base table alone.  ``refine_iters>0``
    Lloyd-refines them (:func:`kmeans_centroids`, the quality path).
    ``pinned=True`` makes every cosine SQL-replayable (see
    :func:`_np_cos_to_cents`)."""
    if refine_iters > 0:
        cents = kmeans_centroids(df, n_cells, refine_iters, vec_col, id_col)
    else:
        rows = (
            df.filter(F.col(id_col) < n_cells).orderBy(id_col).select(vec_col).collect()
        )
        cents = np.asarray([r[0] for r in rows], dtype=np.float64)
    assigned = df.withColumn("_cell", _cell_assigner(cents, pinned)(F.col(vec_col)))
    if path is not None:
        spark = df.sparkSession
        assigned.write.mode("overwrite").partitionBy("_cell").parquet(f"{path}/assign")
        spark.createDataFrame(
            [(int(i), [float(x) for x in cents[i]]) for i in range(len(cents))],
            "cell long, centroid array<double>",
        ).write.mode("overwrite").parquet(f"{path}/centroids")
        assigned = spark.read.parquet(f"{path}/assign")
    return IvfIndex(cents, assigned, vec_col, id_col, pinned)


def load_ivf_index(
    spark,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pinned: bool = False,
) -> IvfIndex:
    """Reopen a persisted IVF index — no corpus pass, no kmeans."""
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    cents = np.asarray([r["centroid"] for r in rows], dtype=np.float64)
    return IvfIndex(cents, spark.read.parquet(f"{path}/assign"), vec_col, id_col, pinned)


def ivf_probe_topk(
    index: IvfIndex,
    query_vec,
    k: int = 20,
    n_probe: int = 4,
    exclude_id: int | None = None,
) -> DataFrame:
    """Probe-only IVF query: pick the ``n_probe`` nearest cells by
    centroid cosine DRIVER-SIDE (n_cells floats — no Spark job), scan only
    those cells of the assignment table (partition-pruned when the index
    is persisted), exact-cosine re-rank inside them.  A query touches
    n_probe/n_cells of the data; the index is never rebuilt."""
    qv = np.asarray(query_vec, dtype=np.float64)[None, :]
    cos = _np_cos_to_cents(qv, index.centroids, index.pinned)[0]
    probe = sorted(range(len(cos)), key=lambda c: (-cos[c], c))[:n_probe]

    spark = index.assigned.sparkSession
    q = spark.createDataFrame(
        [([float(x) for x in qv[0]],)], "_qvec array<double>"
    )
    cand = index.assigned.filter(F.col("_cell").isin([int(c) for c in probe]))
    if exclude_id is not None:
        cand = cand.filter(F.col(index.id_col) != exclude_id)
    cosx = _cos_col(index.vec_col, "_qvec")
    return (
        cand.crossJoin(F.broadcast(q))
        .withColumn("cosine", cosx)
        .orderBy(F.desc("cosine"), F.asc(index.id_col))
        .limit(k)
        .select(F.col(index.id_col), "cosine")
    )


def lsh_planes(dim: int, n_planes: int, seed: int = 42) -> "np.ndarray":
    """The (dim, n_planes) hyperplane matrix used by :func:`lsh_signatures`
    — exposed so oracles can embed the exact coefficients as SQL literals
    and replay the signatures engine-independently."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes))


def _np_sigs(m: "np.ndarray", planes: "np.ndarray", pinned: bool) -> "np.ndarray":
    """int64 signatures for a (batch, dim) float64 matrix.  ``pinned=True``
    accumulates the plane dots in ascending dimension order so every sign
    bit is bit-identical to a sequential left-to-right SQL ``list_sum``
    replay (oracle-replayable); ``pinned=False`` is one BLAS matmul per
    batch — the scale path (the pinned loop costs ~dim fused vector ops
    instead of one GEMM)."""
    n_planes = planes.shape[1]
    if pinned:
        dots = np.zeros((m.shape[0], n_planes))
        for d in range(planes.shape[0]):
            dots += m[:, d : d + 1] * planes[d]
    else:
        dots = m @ planes
    bits = dots > 0
    out = np.zeros(m.shape[0], dtype=np.int64)
    for j in range(n_planes):
        out |= bits[:, j].astype(np.int64) << j
    return out


def lsh_signatures(
    df: DataFrame,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    pinned: bool = False,
) -> DataFrame:
    """(id, sig) — random-hyperplane signature (sign bits of plane dots),
    planes drawn from a seeded RNG so the index is reproducible.
    Vectorized pandas UDF; pass ``pinned=True`` only when a SQL oracle
    must replay the sign bits bit-for-bit (see :func:`_np_sigs`)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = lsh_planes(dim, n_planes, seed)

    @F.pandas_udf(LongType())
    def sig_udf(vs: pd.Series) -> pd.Series:
        m = np.asarray(vs.tolist(), dtype=np.float64)  # (batch, dim)
        return pd.Series(_np_sigs(m, planes, pinned))

    return spread(df).select(
        F.col(id_col).alias("id"), sig_udf(F.col(vec_col)).alias("sig")
    )


def hamming_ball(sig: int, n_planes: int, radius: int) -> list[int]:
    """All signatures within ``radius`` bit flips of ``sig`` — the
    Σ C(n_planes, i) multi-probe set, enumerated driver-side."""
    from itertools import combinations

    out = []
    for r in range(radius + 1):
        for bits in combinations(range(n_planes), r):
            mask = 0
            for b in bits:
                mask |= 1 << b
            out.append(sig ^ mask)
    return out


class LshIndex:
    """A persisted LSH ANN index: the (id, vec, sig) table partitioned by
    ``_p`` — the top ``prefix_bits`` of the signature — plus the plane
    matrix (recomputable from the seed).  Queries probe a Hamming ball and
    touch only the partitions holding probed prefixes."""

    def __init__(self, sigs, planes, n_planes, seed, prefix_bits, pinned, vec_col, id_col):
        self.sigs = sigs
        self.planes = planes
        self.n_planes = n_planes
        self.seed = seed
        self.prefix_bits = prefix_bits
        self.pinned = pinned
        self.vec_col = vec_col
        self.id_col = id_col


def build_lsh_index(
    df: DataFrame,
    path: str | None = None,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pinned: bool = False,
    prefix_bits: int = 6,
) -> LshIndex:
    """Build the LSH signature table ONCE — (id, vec, sig, _p) with the
    vector stored alongside so a probe never joins back to the corpus —
    and, when ``path`` is given, write it partitioned by ``_p`` (2^prefix_bits
    directories) so probe equi-joins prune partitions at rest."""
    dim = len(df.select(vec_col).first()[0])
    planes = lsh_planes(dim, n_planes, seed)
    sigs = lsh_signatures(df, n_planes, seed, vec_col, id_col, dim=dim, pinned=pinned)
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    shift = n_planes - prefix_bits
    tbl = sigs.join(vecs, "id").withColumn(
        "_p", F.shiftright(F.col("sig"), shift).cast("int")
    )
    if path is not None:
        spark = df.sparkSession
        tbl.write.mode("overwrite").partitionBy("_p").parquet(f"{path}/sigs")
        spark.createDataFrame(
            [(int(n_planes), int(seed), int(prefix_bits), int(dim), bool(pinned))],
            "n_planes int, seed int, prefix_bits int, dim int, pinned boolean",
        ).write.mode("overwrite").parquet(f"{path}/meta")
        tbl = spark.read.parquet(f"{path}/sigs")
    return LshIndex(tbl, planes, n_planes, seed, prefix_bits, pinned, vec_col, id_col)


def load_lsh_index(spark, path: str, vec_col: str = "embedding", id_col: str = "vec_id") -> LshIndex:
    """Reopen a persisted LSH index — planes rebuilt from the stored seed."""
    m = spark.read.parquet(f"{path}/meta").collect()[0]
    planes = lsh_planes(int(m["dim"]), int(m["n_planes"]), int(m["seed"]))
    return LshIndex(
        spark.read.parquet(f"{path}/sigs"),
        planes,
        int(m["n_planes"]),
        int(m["seed"]),
        int(m["prefix_bits"]),
        bool(m["pinned"]),
        vec_col,
        id_col,
    )


def lsh_probe_topk(
    index: LshIndex,
    query_vec,
    k: int = 20,
    max_probe_hamming: int = 2,
    exclude_id: int | None = None,
) -> DataFrame:
    """Probe-only ANN query against a built :class:`LshIndex`: the query
    signature and its Hamming ball are computed driver-side (no Spark
    job), the ball's distinct prefixes prune partitions, the probe sigs
    equi-join inside them, and survivors are exact-cosine re-ranked.  No
    full signature scan anywhere."""
    qv = np.asarray(query_vec, dtype=np.float64)[None, :]
    qsig = int(_np_sigs(qv, index.planes, index.pinned)[0])
    probes = hamming_ball(qsig, index.n_planes, max_probe_hamming)
    shift = index.n_planes - index.prefix_bits
    prefixes = sorted({p >> shift for p in probes})

    spark = index.sigs.sparkSession
    probe_df = spark.createDataFrame([(int(p),) for p in probes], "sig long")
    cand = index.sigs.filter(F.col("_p").isin([int(p) for p in prefixes])).join(
        F.broadcast(probe_df), "sig"
    )
    if exclude_id is not None:
        cand = cand.filter(F.col("id") != exclude_id)
    q = spark.createDataFrame([([float(x) for x in qv[0]],)], "_qvec array<double>")
    cos = _cos_col("vec", "_qvec")
    return (
        cand.crossJoin(F.broadcast(q))
        .withColumn("cosine", cos)
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(index.id_col), "cosine")
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
    pinned: bool = False,
    sig_table: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors whose signature is within
    ``max_probe_hamming`` bits of the query signature (multi-probe LSH).

    The probe set — all Σ C(n_planes, i≤r) signatures in the Hamming ball
    — is enumerated DRIVER-SIDE and broadcast-equi-joined against the
    signature table: candidates prune by bucket instead of scanning every
    signature (identical candidate set to a full ``bit_count(xor) ≤ r``
    scan, without touching the other buckets).  Pass a persisted
    ``sig_table`` (see :func:`write_lsh_index` — partitioned by sig
    prefix) and the equi-join also prunes partitions at rest."""
    sigs = (
        sig_table
        if sig_table is not None
        else lsh_signatures(df, n_planes, seed, vec_col, id_col, pinned=pinned)
    )
    qsig = int(
        sigs.filter(F.col("id") == query_vec_id).select("sig").collect()[0][0]
    )
    probes = hamming_ball(qsig, n_planes, max_probe_hamming)
    probe_df = df.sparkSession.createDataFrame([(int(p),) for p in probes], "sig long")
    cand_ids = (
        sigs.join(F.broadcast(probe_df), "sig")
        .filter(F.col("id") != query_vec_id)
        .select(F.col("id").alias(id_col))
    )
    cand = df.join(cand_ids, id_col)
    q = df.filter(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("_qvec"))
    cos = _cos_col(vec_col, "_qvec")
    return (
        cand.crossJoin(F.broadcast(q))
        .withColumn("cosine", cos)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col), "cosine")
    )
