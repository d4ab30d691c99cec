"""Persisted dedup index (ops/dedup.py: write_dedup_index /
dedup_against_index) — the at-rest analogue of the posting index: build
once, probe per delta, append-only growth."""

import pytest
from pyspark.sql import functions as F

from groonga_spark.ops.dedup import (
    dedup_against_index,
    load_dedup_index,
    write_dedup_index,
)

BASE = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "one two three four five"),
    (3, "red green blue cyan magenta"),
    (4, "north south east west center"),
    (5, "lorem ipsum dolor sit amet"),
    (6, "spark shuffle partition broadcast join"),
    (7, "tokyo osaka kyoto nagoya sapporo"),
    (8, "cat dog bird fish horse"),
    (9, "iron gold silver copper zinc"),
    (10, "violin cello flute oboe harp"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_drops_near_dups_but_not_reingested_self(spark, tmp_path):
    p = str(tmp_path / "ddx")
    idx = write_dedup_index(_df(spark, BASE), p, n_bands=4, r=2)
    new = _df(
        spark,
        [
            (11, BASE[0][1]),                 # exact copy of doc 1 → dropped
            (12, "totally fresh words here now"),  # unique → kept
            (1, BASE[0][1]),                  # re-ingest under its own id → kept
            # J=3/4 vs doc 1 (3 shared shingles of 4) — a verified band
            # collision (all 4 bands match doc 1's)
            (14, "alpha beta gamma delta epsilon extra"),
        ],
    )
    out = sorted(r.doc_id for r in dedup_against_index(new, idx, threshold=0.8).collect())
    assert out == [1, 12, 14]          # 0.75 < 0.8 → 14 survives the verify
    out2 = sorted(r.doc_id for r in dedup_against_index(new, idx, threshold=0.7).collect())
    assert out2 == [1, 12]             # 0.75 >= 0.7 → 14 dropped


def test_append_equals_one_shot_build(spark, tmp_path):
    p_inc = str(tmp_path / "inc")
    p_full = str(tmp_path / "full")
    write_dedup_index(_df(spark, BASE[:5]), p_inc)
    write_dedup_index(_df(spark, BASE[5:]), p_inc, mode="append")
    write_dedup_index(_df(spark, BASE), p_full)
    inc = load_dedup_index(spark, p_inc)
    full = load_dedup_index(spark, p_full)
    assert (
        sorted(map(tuple, inc.bands.collect()))
        == sorted(map(tuple, full.bands.collect()))
    )
    assert (
        sorted(map(tuple, inc.shingles.collect()))
        == sorted(map(tuple, full.shingles.collect()))
    )
    new = _df(spark, [(20, BASE[6][1]), (21, "nothing shared with anything else")])
    got = sorted(r.doc_id for r in dedup_against_index(new, inc, threshold=0.8).collect())
    want = sorted(r.doc_id for r in dedup_against_index(new, full, threshold=0.8).collect())
    assert got == want == [21]


def test_append_param_mismatch_fails_loudly(spark, tmp_path):
    p = str(tmp_path / "mm")
    write_dedup_index(_df(spark, BASE[:3]), p, n_bands=4, r=2)
    with pytest.raises(ValueError, match="append"):
        write_dedup_index(_df(spark, BASE[3:]), p, n_bands=2, r=2, mode="append")


def test_band_table_is_partition_pruned(spark, tmp_path):
    import contextlib
    import io

    p = str(tmp_path / "pp")
    idx = write_dedup_index(_df(spark, BASE), p)
    one_band = idx.bands.filter(F.col("band") == 2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_band.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "band" in plan.split("PartitionFilters", 1)[1][:200]
