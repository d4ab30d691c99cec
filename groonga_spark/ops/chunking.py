"""Document chunking and sequence packing for training pipelines.

Before tokenization-for-training, long documents are split into
overlapping token windows (chunking), and the resulting chunks are
grouped into fixed token-budget bins (sequence packing) so batches waste
no padding.  Both are pure Column expressions here:

* ``chunk_documents`` — the split is ``transform(sequence(...))`` over
  the whitespace-token array + one ``explode``: map-side only, no
  shuffle, output rows ∝ corpus tokens.  At 100 TB this runs inside the
  same scan stage as any downstream filter.
* ``pack_chunks`` — deterministic contiguous packing: chunks shard into
  ``n_streams`` independent packing streams by hash (md5 of
  (id, chunk_no), the same engine-independent discipline as
  ``ops/sampling``), are laid out in canonical hash order within their
  stream, and a running token total assigns ``bin_id = prev_cum //
  budget`` per stream.  The window partitions on the stream, so the
  sort parallelism is ``n_streams`` — size it to the cluster and no
  single partition ever sees the whole corpus.  A bin may overflow
  ``budget`` by at most one chunk's tokens - 1 (a chunk is never
  split), the standard greedy-contiguous trade.

Integer-only arithmetic throughout (counts, floor division) so the
DuckDB oracle reproduces every boundary bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_no, n_tokens, chunk) — overlapping whitespace-token
    windows: stride = max_tokens - overlap; a doc with n <= max_tokens
    tokens yields exactly one chunk; otherwise
    ``1 + ceil((n - max_tokens) / stride)`` chunks, the last one shorter.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    w = f"split(`{text_col}`, ' ')"
    n = f"size({w})"
    # integer ceil((n - max_tokens)/stride) + 1, clamped to >= 1 — DIV is
    # SQL integer division, so no double-rounding divergence from the
    # oracle's `//` at any token count
    n_chunks = (
        f"IF({n} <= {max_tokens}, 1,"
        f" 1 + (({n} - {max_tokens} + {stride - 1}) DIV {stride}))"
    )
    chunk_struct = (
        f"transform(sequence(0, {n_chunks} - 1), c -> named_struct("
        f"'chunk_no', c,"
        f" 'n_tokens', LEAST({max_tokens}, {n} - c * {stride}),"
        f" 'chunk', concat_ws(' ', slice({w}, c * {stride} + 1, {max_tokens}))))"
    )
    return df.select(
        F.col(id_col), F.explode(F.expr(chunk_struct)).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_no").cast("long").alias("chunk_no"),
        F.col("c.n_tokens").cast("long").alias("n_tokens"),
        F.col("c.chunk").alias("chunk"),
    )


def pack_chunks(
    chunks: DataFrame,
    budget: int = 512,
    n_streams: int = 8,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_no",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(id, chunk_no, n_tokens, stream, bin_id, offset) — deterministic
    contiguous sequence packing: hash-sharded into ``n_streams``
    independent streams, canonical hash order within each, running token
    total, ``bin_id = tokens_before // budget`` and ``offset =
    tokens_before % budget`` (where this chunk starts inside its
    (stream, bin))."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.col(chunk_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("_s").orderBy("_h", id_col, chunk_col)
    prev = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    return (
        chunks.withColumn("_h", h)
        .withColumn("_s", F.pmod(F.col("_h"), F.lit(n_streams)).cast("long"))
        .withColumn("_prev", prev)
        .select(
            id_col,
            chunk_col,
            F.col(tokens_col),
            F.col("_s").alias("stream"),
            F.expr(f"_prev DIV {int(budget)}").alias("bin_id"),
            F.pmod(F.col("_prev"), F.lit(budget)).cast("long").alias("offset"),
        )
    )
