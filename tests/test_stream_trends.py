"""Watermarked event-time windowed term counts: windows finalize in append
mode once the watermark passes; events later than the watermark are
dropped instead of reopening finalized windows."""

import pandas as pd

from groonga_spark.ops.stream_trends import windowed_term_counts


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "ts timestamp, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _ts(s):
    return pd.Timestamp(s).to_pydatetime()


def test_windowed_counts_and_late_drop(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: two events in the 10:00 window, one in 10:10
    _write_batch(
        spark,
        src,
        [
            (_ts("2026-01-01 10:01:00"), "spark index"),
            (_ts("2026-01-01 10:04:00"), "spark"),
            (_ts("2026-01-01 10:11:00"), "probe"),
        ],
    )
    stream = spark.readStream.schema("ts timestamp, text string").parquet(src)
    q = (
        windowed_term_counts(stream, window="10 minutes", late="5 minutes")
        .writeStream.format("memory")
        .queryName("trends_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # batch boundaries forced by draining between writes: the watermark
        # only advances BETWEEN micro-batches (previous batch's max event
        # time minus the threshold)
        q.processAllAvailable()
        # batch 2: far-ahead event → watermark 10:40-5m=10:35 passes the
        # earlier windows' ends; they finalize and emit
        _write_batch(spark, src, [(_ts("2026-01-01 10:40:00"), "ahead")])
        q.processAllAvailable()
        # batch 3: late event for the finalized 10:00 window → dropped
        _write_batch(spark, src, [(_ts("2026-01-01 10:02:00"), "spark")])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM trends_out").collect()
    got = {
        (r["window_start"].strftime("%H:%M"), r["term"]): r["n"] for r in rows
    }
    # the 10:00 window finalized with batch-1 counts only — the late
    # 10:02 'spark' arrival was beyond the watermark and dropped
    assert got[("10:00", "spark")] == 2
    assert got[("10:00", "index")] == 1
    assert got[("10:10", "probe")] == 1
    # the 10:40 window is NOT finalized yet (watermark hasn't passed its
    # end) → append mode hasn't emitted it
    assert ("10:40", "ahead") not in got
