"""Index-assisted sort (SURVEY §2.7): top-k on a sort column without
scanning (or sorting) the whole table.

The reference reads records through a sorted PAT/index cursor and stops at
limit (`grn_table_sort` with an index, lib/db.c:10184-10240).  The
Spark-native equivalent is a SORTED LAYOUT plus file-statistics pruning:

* :func:`write_sorted` lays the table out range-partitioned and sorted by
  the sort key (``repartitionByRange`` + ``sortWithinPartitions``) — on
  Iceberg this is ``ALTER TABLE ... WRITE ORDERED BY``;
* :func:`topk_sorted` answers ``ORDER BY col [DESC] LIMIT k`` by reading
  parquet FOOTER min/max statistics (pyarrow, driver-side, one footer per
  file — no data IO), picking the files at the relevant end of the range
  until their row counts cover k, and scanning ONLY those.  Result is
  identical to the full ``orderBy().limit()`` because range partitioning
  guarantees every row outside the chosen files orders after (or before)
  the covered rows.

At 10^12 rows a top-k touches a handful of files instead of the table —
the same work-skipping as the reference's ordered index read."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_sorted(df: DataFrame, path: str, col: str, n_buckets: int = 8) -> None:
    """Range-partition by ``col`` into ``n_buckets`` sorted files."""
    (
        df.repartitionByRange(n_buckets, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def _file_stats(path: str, col: str) -> list[tuple[str, object, object, int]]:
    """(file, min, max, n_rows) per parquet part file — footer metadata
    only, read driver-side (one footer per file; at 10^12 rows this is the
    manifest read, not a data scan)."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = os.path.join(path, name)
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        n = md.num_rows
        if n == 0:
            continue
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((f, lo, hi, n))
    return out


def topk_sorted(
    spark: SparkSession,
    path: str,
    col: str,
    k: int,
    ascending: bool = True,
    select_cols: list[str] | None = None,
) -> DataFrame:
    """``ORDER BY col [DESC] LIMIT k`` over a :func:`write_sorted` layout,
    scanning only the files whose statistics can contain the top-k.

    Files are ordered by their min (asc) / max (desc); files are taken
    until the accumulated row count reaches k, then every remaining file
    overlapping the k-th candidate bound is included too (overlap-safe:
    ties and range overlap cannot drop a qualifying row).  Falls back to
    the full scan when any footer lacks statistics."""
    stats = _file_stats(path, col)
    full = spark.read.parquet(path)
    if not stats or any(lo is None for _, lo, hi, _ in stats):
        out = full
    else:
        key = (lambda s: s[1]) if ascending else (lambda s: s[2])
        ordered = sorted(stats, key=key, reverse=not ascending)
        chosen, covered = [], 0
        for s in ordered:
            chosen.append(s)
            covered += s[3]
            if covered >= k:
                break
        # bound = the worst stat bound among chosen files; any other file
        # whose range reaches past the bound may still hold qualifying rows
        if ascending:
            bound = max(s[2] for s in chosen)
            extra = [s for s in ordered[len(chosen) :] if s[1] <= bound]
        else:
            bound = min(s[1] for s in chosen)
            extra = [s for s in ordered[len(chosen) :] if s[2] >= bound]
        files = [s[0] for s in chosen + extra]
        out = spark.read.parquet(*files)
    order = F.col(col).asc() if ascending else F.col(col).desc()
    out = out.orderBy(order).limit(k)
    return out.select(*select_cols) if select_cols else out
