"""Cross-batch streaming exact dedup (applyInPandasWithState): one
survivor per distinct text across micro-batches; state survives between
batches of the same query."""

from groonga_spark.ops.stream_dedup import dedup_stream


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_cross_batch_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    # two single-file parquet writes → with maxFilesPerTrigger=1 the query
    # processes them as separate micro-batches, exercising CROSS-batch state
    _write_batch(spark, src, [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")])
    _write_batch(spark, src, [(4, "alpha beta"), (5, "epsilon zeta"), (6, "gamma delta")])

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM dedup_out").collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(r["doc_id"])
    # exactly one survivor per distinct text — the duplicate fingerprints
    # in the second batch were dropped by state from the first
    assert sorted(by_text) == ["alpha beta", "epsilon zeta", "gamma delta"]
    assert all(len(v) == 1 for v in by_text.values())
    # whichever batch arrived first, the survivor is that batch's min id
    assert by_text["alpha beta"][0] in (1, 4)
    assert by_text["gamma delta"][0] in (2, 6)
    assert by_text["epsilon zeta"] == [5]


def test_within_batch_min_id_survives(spark, tmp_path):
    src = str(tmp_path / "src1")
    _write_batch(spark, src, [(9, "same text"), (4, "same text"), (7, "other")])
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["text"]: r["doc_id"] for r in spark.sql("SELECT * FROM dedup_out2").collect()}
    assert got == {"same text": 4, "other": 7}
