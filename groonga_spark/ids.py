"""Scalable dense doc-id assignment.

Groonga's ``grn_id`` is a dense 1..N record id (``grn_table_add``,
lib/db.c:1163).  A naive ``row_number() OVER (ORDER BY ...)`` funnels the
whole table through ONE window partition — fine at test scale, fatal at
10^12 rows.  This is the classic two-pass zipWithIndex: range-partition by
the order key, count per partition, broadcast the per-partition offsets,
then add a within-partition row_number.  Only the tiny counts table hits the
driver; data shuffles once (the range partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "doc_id",
    start: int = 1,
) -> DataFrame:
    n_part = max(df.rdd.getNumPartitions(), 1)
    parted = df.repartitionByRange(n_part, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # pass 1: per-partition counts (tiny — one row per partition)
    counts = parted.groupBy("_pid").count().orderBy("_pid").collect()
    offsets = {}
    acc = start
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    off_df = parted.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        parted.join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, (F.row_number().over(w) - 1 + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )
    return out
