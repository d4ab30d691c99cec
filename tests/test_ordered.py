"""Index-assisted sort (ordered.py): top-k over a sorted layout must be
identical to the full orderBy().limit() AND provably scan fewer files."""

import pytest
from pyspark.sql import functions as F

from groonga_spark.ordered import _file_stats, topk_sorted, write_sorted


@pytest.fixture(scope="module")
def sorted_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ordered") / "tbl")
    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") * 37 % 4999).alias("v"),  # permuted, unique values
    )
    write_sorted(df, path, "v", n_buckets=8)
    return path


def test_topk_matches_full_sort(spark, sorted_path):
    full = spark.read.parquet(sorted_path)
    for asc in (True, False):
        got = [
            r["id"]
            for r in topk_sorted(spark, sorted_path, "v", 17, ascending=asc).collect()
        ]
        order = F.col("v").asc() if asc else F.col("v").desc()
        want = [r["id"] for r in full.orderBy(order).limit(17).collect()]
        assert got == want


def test_prunes_files(spark, sorted_path):
    stats = _file_stats(sorted_path, "v")
    assert len(stats) >= 4  # the layout actually split
    # k smaller than one bucket: the covering set must be a strict subset
    covered = [s for s in sorted(stats, key=lambda s: s[1])]
    assert covered[0][3] > 17  # first file alone covers k=17
    # pruning argument: sum of rows in files NOT needed is > 0
    df = topk_sorted(spark, sorted_path, "v", 17)
    n_scanned_files = len(df.inputFiles())
    assert n_scanned_files < len(stats)


def test_k_larger_than_table(spark, sorted_path):
    got = topk_sorted(spark, sorted_path, "v", 10_000).count()
    assert got == 5000


def test_fallback_without_stats(spark, tmp_path):
    # a plain unsorted write still answers correctly (falls back / overlap
    # inclusion keeps it exact)
    path = str(tmp_path / "plain")
    df = spark.range(0, 500).select(F.col("id"), (499 - F.col("id")).alias("v"))
    df.repartition(4).write.parquet(path)
    got = [r["id"] for r in topk_sorted(spark, path, "v", 5).collect()]
    want = [r["id"] for r in spark.read.parquet(path).orderBy("v").limit(5).collect()]
    assert got == want
