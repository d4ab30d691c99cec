"""Shared helpers for the pipeline ops."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the cluster's parallelism IF it arrives in
    fewer partitions — and be a NO-OP otherwise.

    Why: the compute-heavy text ops (shingling, hashing, n-gram stats) are
    bottlenecked by input partitioning, not data volume, on small inputs —
    a single sub-128MB parquet file arrives as ONE partition and the whole
    pipeline runs on one core.  At production scale the input has far more
    partitions than the cluster has cores, the gate is false, and no
    shuffle is added; the repartition only ever fires where its cost
    (shuffling a tiny input) is negligible and the win is n_cores×.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
