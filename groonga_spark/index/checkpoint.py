"""Checkpointed, resumable index build with per-partition lineage.

Groonga's offline build spills tokenized blocks to a tmpfile and merges
them per term (grn_ii_buffer_flush/commit, lib/ii.c:7310,7855) — an
interrupted build restarts from nothing.  The north rule requires better:
an interrupted 10^12-file run must resume without recomputation.  Layout:

    <path>/stats.json        n_docs, per-section token totals, tokenizer
    <path>/doclens/          (doc_id, sid, dl) parquet
    <path>/dictionary/       (term, df, cf, term_id) parquet
    <path>/tf/               stage-T output, partitioned by pbucket
    <path>/postings/         block table, partitioned by pbucket
    <path>/manifest/         lineage + metrics, appended per completed unit

Resume granularity: stage T/D are single atomic parquet jobs (the Spark
committer publishes files only on job success, so a killed run leaves no
partial state); stage P — the expensive merge — commits **per pbucket
wave**: each wave encodes a subset of term-hash buckets, appends its
partitions, then appends manifest rows.  On restart, buckets already in the
manifest are skipped.

Lineage invariant: a ``corpus`` manifest row records ``bit_xor`` over the
per-row sha256(content) prefixes; ``verify_lineage`` recomputes it from the
source frame so any corpus drift between build and resume is detected.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _write_dictionary(dictionary: DataFrame, path: str) -> None:
    """Write the term dictionary range-sorted by ``term``: each output
    file covers a contiguous term range and rows inside are sorted, so
    parquet footer min/max statistics turn every exact / prefix lookup
    (``term IN (...)``, ``term LIKE 'pfx%'`` — the engine's pushed
    predicates) into a row-group-pruned point read instead of a full
    dictionary scan.  The PAT lexicon gives Groonga the same property via
    key order (lib/pat.c); range-sorted parquet is the columnar analogue."""
    (
        dictionary.repartitionByRange(F.col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(path)
    )

from .build import (
    DEFAULT_N_PBUCKETS,
    DEFAULT_POSTINGS_PER_BUCKET,
    IndexStats,
    InvertedIndex,
    collect_stats,
    encode_partitions,
    encode_postings,
    make_dictionary,
    salted_tf,
    tf_stage,
)

MANIFEST_SCHEMA = (
    "stage string, partition_id int, input_rows long, n_terms long, "
    "n_postings long, content_sha_xor string, wall_ms long, status string"
)


def _sha_xor(df: DataFrame, sha_col: str = "content_sha") -> str:
    """bit_xor over the first 15 hex chars of each row's sha256 — an
    order-insensitive corpus fingerprint."""
    row = df.select(
        F.expr(f"bit_xor(conv(substr({sha_col}, 1, 15), 16, 10) :: long)").alias("x")
    ).collect()[0]
    return format(row["x"] or 0, "x")


def _append_manifest(spark: SparkSession, path: str, rows: list[tuple]):
    spark.createDataFrame(rows, MANIFEST_SCHEMA).coalesce(1).write.mode("append").parquet(
        os.path.join(path, "manifest")
    )


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "manifest"))


def _done(path: str, sub: str) -> bool:
    return os.path.exists(os.path.join(path, sub, "_SUCCESS"))


def build_index_checkpointed(
    df: DataFrame,
    text_cols: list[str],
    path: str,
    tokenizer: str = "bigram",
    id_col: str = "doc_id",
    postings_per_bucket: int = DEFAULT_POSTINGS_PER_BUCKET,
    n_pbuckets: int = DEFAULT_N_PBUCKETS,
    waves: int = 8,
    max_waves: int | None = None,
    sha_col: str = "content_sha",
    token_filters: tuple = (),
    stopwords=frozenset(),
) -> InvertedIndex | None:
    """Build (or resume building) the index at ``path``.  Returns the loaded
    index, or None if ``max_waves`` stopped the build early (used by the
    resume tests to simulate an interruption)."""
    spark = df.sparkSession
    os.makedirs(path, exist_ok=True)
    stats_path = os.path.join(path, "stats.json")

    # ---- stage T + D (atomic parquet jobs) -------------------------------
    if not (_done(path, "tf") and _done(path, "dictionary") and os.path.exists(stats_path)):
        t0 = time.monotonic()
        tf, doclens = tf_stage(df, text_cols, tokenizer, id_col, tuple(token_filters))
        stats = collect_stats(df, doclens, text_cols)
        doclens.write.mode("overwrite").parquet(os.path.join(path, "doclens"))
        doclens = spark.read.parquet(os.path.join(path, "doclens"))
        dictionary = make_dictionary(tf)
        _write_dictionary(dictionary, os.path.join(path, "dictionary"))
        dictionary = spark.read.parquet(os.path.join(path, "dictionary"))
        tf2 = salted_tf(tf, doclens, dictionary, postings_per_bucket, n_pbuckets)
        tf2.write.mode("overwrite").partitionBy("pbucket").parquet(os.path.join(path, "tf"))
        with open(stats_path, "w") as f:
            json.dump(
                {
                    "n_docs": stats.n_docs,
                    "section_tokens": stats.section_tokens,
                    "sections": stats.sections,
                    "tokenizer": tokenizer,
                    "n_pbuckets": n_pbuckets,
                    "token_filters": list(token_filters),
                    "stopwords": sorted(stopwords),
                },
                f,
            )
        sha_xor = _sha_xor(df, sha_col) if sha_col in df.columns else ""
        _append_manifest(
            spark,
            path,
            [
                (
                    "corpus",
                    -1,
                    int(stats.n_docs),
                    0,
                    0,
                    sha_xor,
                    int((time.monotonic() - t0) * 1000),
                    "ok",
                )
            ],
        )

    stats = _load_stats(stats_path)
    avgdl_by_sid = {sid: stats.avgdl(sid) for sid in stats.section_tokens}

    # ---- stage P: per-bucket waves with resume ---------------------------
    done_buckets: set[int] = set()
    if os.path.exists(os.path.join(path, "manifest")):
        done_buckets = {
            int(r["partition_id"])
            for r in read_manifest(spark, path)
            .filter("stage = 'postings' and status = 'ok'")
            .collect()
        }
    remaining = [b for b in range(n_pbuckets) if b not in done_buckets]
    wave_size = max(1, (n_pbuckets + waves - 1) // waves)
    wave_list = [remaining[i : i + wave_size] for i in range(0, len(remaining), wave_size)]
    tf_all = spark.read.parquet(os.path.join(path, "tf"))

    for wi, wave in enumerate(wave_list):
        if max_waves is not None and wi >= max_waves:
            return None  # simulated interruption
        t0 = time.monotonic()
        tf_w = tf_all.filter(F.col("pbucket").isin([int(b) for b in wave]))
        # data-sized exchange (see build.encode_partitions): this wave
        # carries ~len(wave)/n_pbuckets of the corpus tokens
        wave_tokens = (
            sum(stats.section_tokens.values()) * len(wave) // max(n_pbuckets, 1)
        )
        posts = encode_postings(
            tf_w,
            stats.n_docs,
            avgdl_by_sid,
            num_partitions=encode_partitions(spark, wave_tokens),
        )
        posts.write.mode("append").partitionBy("pbucket").parquet(
            os.path.join(path, "postings")
        )
        wall = int((time.monotonic() - t0) * 1000)
        written = (
            spark.read.parquet(os.path.join(path, "postings"))
            .filter(F.col("pbucket").isin([int(b) for b in wave]))
            .groupBy("pbucket")
            .agg(
                F.countDistinct("term").alias("n_terms"),
                F.sum("n_postings").alias("n_postings"),
            )
            .collect()
        )
        by_bucket = {int(r["pbucket"]): r for r in written}
        rows = []
        for b in wave:
            r = by_bucket.get(int(b))
            rows.append(
                (
                    "postings",
                    int(b),
                    0,
                    int(r["n_terms"]) if r else 0,
                    int(r["n_postings"]) if r else 0,
                    "",
                    wall,
                    "ok",
                )
            )
        _append_manifest(spark, path, rows)

    return read_index(spark, path)


def _load_stats(stats_path: str) -> IndexStats:
    with open(stats_path) as f:
        d = json.load(f)
    return IndexStats(
        n_docs=d["n_docs"],
        section_tokens={int(k): v for k, v in d["section_tokens"].items()},
        sections={int(k): v for k, v in d["sections"].items()},
    )


def read_index(spark: SparkSession, path: str, storage=None) -> InvertedIndex:
    """Load a persisted index.  ``storage`` (a TableStorage rooted at the
    index location) is the parquet↔Iceberg seam for the three index
    tables; stats.json stays a driver-side metadata file (the Iceberg
    analogue is table properties)."""
    if storage is None:
        from ..storage import ParquetDirStorage

        storage = ParquetDirStorage(spark, path)
    stats = _load_stats(os.path.join(path, "stats.json"))
    with open(os.path.join(path, "stats.json")) as f:
        meta = json.load(f)
    return InvertedIndex(
        dictionary=storage.read("dictionary"),
        postings=storage.read("postings"),
        doclens=storage.read("doclens"),
        stats=stats,
        tokenizer=meta["tokenizer"],
        token_filters=tuple(meta.get("token_filters", [])),
        stopwords=frozenset(meta.get("stopwords", [])),
        n_pbuckets=int(meta.get("n_pbuckets", DEFAULT_N_PBUCKETS)),
        # absent key ⇒ pre-incremental-update index ⇒ exact build-time
        # bounds; an incrementally-updated index round-tripping through
        # write_index must NOT regain exact-bounds status (untouched
        # blocks keep stale build-time max_score under grown n_docs)
        bounds_exact=bool(meta.get("bounds_exact", True)),
    )


def write_index(index: InvertedIndex, path: str, storage=None):
    """Persist an in-memory-built index (non-checkpointed path).  The
    three index tables go through the TableStorage seam (parquet dirs by
    default; an Iceberg catalog in production — see storage.py); the
    dictionary keeps its term-range-sorted layout either way (footer /
    manifest min-max stats both prune on sorted layout)."""
    spark = index.dictionary.sparkSession
    if storage is None:
        from ..storage import ParquetDirStorage

        storage = ParquetDirStorage(spark, path)
    os.makedirs(path, exist_ok=True)
    storage.overwrite(
        "dictionary",
        index.dictionary.repartitionByRange(F.col("term")).sortWithinPartitions(
            "term"
        ),
    )
    storage.overwrite("postings", index.postings, partition_by=["pbucket"])
    storage.overwrite("doclens", index.doclens)
    with open(os.path.join(path, "stats.json"), "w") as f:
        json.dump(
            {
                "n_docs": index.stats.n_docs,
                "section_tokens": index.stats.section_tokens,
                "sections": index.stats.sections,
                "tokenizer": index.tokenizer,
                "n_pbuckets": index.n_pbuckets,
                "token_filters": list(index.token_filters),
                "stopwords": sorted(index.stopwords),
                "bounds_exact": bool(index.bounds_exact),
            },
            f,
        )


def verify_lineage(df: DataFrame, path: str, sha_col: str = "content_sha") -> bool:
    """Recompute the corpus sha-xor fingerprint and compare with the
    manifest — the per-row content sha256 invariant, aggregated."""
    spark = df.sparkSession
    rows = (
        read_manifest(spark, path).filter("stage = 'corpus'").select("content_sha_xor").collect()
    )
    if not rows:
        return False
    return rows[0]["content_sha_xor"] == _sha_xor(df, sha_col)
