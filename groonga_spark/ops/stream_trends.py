"""Streaming windowed term statistics — event-time windows + watermark.

A live ingest feed wants "term frequencies over the last N minutes"
(trending queries / suggest-dataset learning — the reference's suggest
plugin learns from a timestamped query log it ingests continuously;
ours re-expresses that learning loop as a Structured Streaming windowed
aggregation).

Spark-native shape:

    readStream(ts, doc_id, text)
      → explode(tokenize)                  (JVM split, or the engine GET path)
      → withWatermark(ts, late_threshold)
      → groupBy(window(ts, win), term).count()

The watermark bounds the aggregation state: windows older than
``max(event_time) - late`` are finalized and their state dropped, so the
state store never grows with stream length — events later than the
watermark are discarded (documented late-data semantics) instead of
resurrecting dead windows.  Output mode "append" emits each window once,
when it finalizes — the shape a downstream parquet/Iceberg sink needs.

At cluster scale the aggregation is a hash shuffle on (window, term) —
the same partitioning story as the batch dictionary build (term cardinality
dominates; no per-key skew beyond the Zipf head, which AQE handles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_term_counts(
    events: DataFrame,
    window: str = "10 minutes",
    late: str = "5 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
    slide: str | None = None,
) -> DataFrame:
    """Streaming (ts, text) → streaming (window_start, window_end, term, n)
    term counts per event-time window, late data bounded by ``late``.

    Tokenization is the JVM whitespace split (TokenDelimit semantics —
    the suggest log is already query strings, not documents), so the
    whole pipeline stays inside whole-stage codegen; no Python UDF.
    """
    toks = events.select(
        F.col(ts_col).alias("_ts"),
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    win = F.window("_ts", window, slide) if slide else F.window("_ts", window)
    return (
        toks.withWatermark("_ts", late)
        .groupBy(win.alias("w"), "term")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term",
            "n",
        )
    )
