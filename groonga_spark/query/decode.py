"""Block decode — Arrow-batched pandas UDF turning posting blocks back into
(doc_id, sid, tf, dl[, positions]) rows.

Mirrors the index-cursor decode path (reference ``grn_ii_cursor_next``
lib/ii.c:4174, delta decode lib/ii.c:4180-4196).  Block pruning happens
BEFORE this UDF, JVM-side, on the block metadata columns
(first/last_doc_id, max_score) — the Spark analogue of
``grn_ii_cursor_set_min`` skipping whole chunks via ``chunk_info.dgap``
(ii.c:4144-4172).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .. import encoding

_DECODED_SCHEMA = StructType(
    [
        StructField("doc_ids", ArrayType(LongType())),
        StructField("sids", ArrayType(IntegerType())),
        StructField("tfs", ArrayType(IntegerType())),
        StructField("dls", ArrayType(LongType())),
        StructField("poss", ArrayType(ArrayType(IntegerType()))),
    ]
)


def _member_mask(doc_ids: np.ndarray, cand_sorted: np.ndarray) -> np.ndarray:
    """Membership of ``doc_ids`` in SORTED ``cand_sorted`` via
    searchsorted — O(n log m), unlike np.isin's sort of the large side
    per call (the global-candidate path probes a ≤500k array once per
    128-posting block, where isin's O(m log m) would dominate)."""
    if cand_sorted.size == 0:
        return np.zeros(doc_ids.shape, dtype=bool)
    pos = np.minimum(
        np.searchsorted(cand_sorted, doc_ids), cand_sorted.size - 1
    )
    return cand_sorted[pos] == doc_ids


def _decode_one(
    first_doc, n, enc, doc_b, sid_b, tf_b, dl_b, pos_b, with_pos, cand=None
):
    """``cand`` (optional SORTED int64 array of candidate doc ids) masks
    the OUTPUT of the decode: the delta/varbyte streams are sequential so
    every posting must be decoded, but non-candidate rows are dropped
    before the position cumsum loop and before Arrow serialization —
    for a spread candidate set over head terms this cuts the shipped
    position arrays (and the per-posting Python loop) from every posting
    in the block to just the candidates."""
    n = int(n)
    deltas = (
        encoding.pfor_decode(doc_b, n) if (enc & 1) else encoding.vb_decode(doc_b, n)
    ).astype(np.int64)
    # first stored delta is 0 relative to first_doc_id
    doc_ids = np.cumsum(deltas) - int(deltas[0]) + int(first_doc)
    tfs = (
        encoding.pfor_decode(tf_b, n) if (enc & 2) else encoding.vb_decode(tf_b, n)
    ).astype(np.int64) + 1
    sids = encoding.vb_decode(sid_b, n).astype(np.int64) + 1
    dls = encoding.vb_decode(dl_b, n).astype(np.int64)
    poss: list[list[int]] | None = None
    if with_pos:
        total = int(tfs.sum())
        gaps = encoding.vb_decode(pos_b, total).astype(np.int64)
        if cand is not None:
            offs = np.concatenate(([0], np.cumsum(tfs)))
            keep = np.nonzero(_member_mask(doc_ids, cand))[0]
            poss = [
                np.cumsum(gaps[offs[i] : offs[i + 1]]).tolist()
                for i in keep.tolist()
            ]
            return doc_ids[keep], sids[keep], tfs[keep], dls[keep], poss
        poss = []
        off = 0
        for t in tfs.tolist():
            poss.append(np.cumsum(gaps[off : off + t]).tolist())
            off += t
    elif cand is not None:
        keep = _member_mask(doc_ids, cand)
        return doc_ids[keep], sids[keep], tfs[keep], dls[keep], None
    return doc_ids, sids, tfs, dls, poss


_DOCS_ONLY_SCHEMA = StructType([StructField("doc_ids", ArrayType(LongType()))])


def make_docs_only_udf():
    """Membership decode: only the doc-delta stream is decoded — no
    tf/sid/dl/position work, no per-posting Python beyond one cumsum per
    block.  The AND_NOT right side (grn_ii_resolve_sel_and, ii.c:6740)
    needs nothing else."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for first_doc, n, enc, db in zip(
                pdf["first_doc_id"], pdf["n"], pdf["enc"], pdf["doc_deltas"]
            ):
                n = int(n)
                deltas = (
                    encoding.pfor_decode(db, n)
                    if (int(enc) & 1)
                    else encoding.vb_decode(db, n)
                ).astype(np.int64)
                out.append(
                    (np.cumsum(deltas) - int(deltas[0]) + int(first_doc)).tolist()
                )
            yield pd.DataFrame({"doc_ids": out})

    return F.pandas_udf(fn, _DOCS_ONLY_SCHEMA)


def decoded_doc_ids(blocks_df):
    """blocks → bare ``doc_id`` rows (duplicates across sections/salts
    retained — membership consumers don't care)."""
    udf = make_docs_only_udf()
    d = blocks_df.withColumn(
        "d", udf(F.struct("first_doc_id", "n", "enc", "doc_deltas"))
    )
    out = d.select(
        *(["_excl"] if "_excl" in blocks_df.columns else []),
        F.explode("d.doc_ids").alias("doc_id"),
    )
    return _apply_excl(out, blocks_df).select("doc_id")


def make_decode_udf(
    with_pos: bool, with_cand: bool = False, cand_global=None
):
    """``cand_global``: a sorted int64 numpy array of candidate doc ids
    applied to EVERY block (the rarest-first positional path: the rare
    token's doc set, bounded by MAX_BROADCAST_DOCS, captured in the UDF
    closure).  Blocks whose [first_doc_id, last_doc_id] span contains no
    candidate are skipped without decoding — grn_ii_cursor_set_min's
    chunk skip (ii.c:4144) driven by the rarest token's doc ids instead
    of a score threshold."""
    cg = (
        None
        if cand_global is None
        else np.asarray(cand_global, dtype=np.int64)
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_ids": [], "sids": [], "tfs": [], "dls": [], "poss": []}
            cands = pdf["_cand"] if with_cand else None
            lasts = pdf["last_doc_id"] if cg is not None else None
            for i, (first_doc, n, enc, db, sb, tb, lb, pb) in enumerate(
                zip(
                    pdf["first_doc_id"],
                    pdf["n"],
                    pdf["enc"],
                    pdf["doc_deltas"],
                    pdf["sids"],
                    pdf["tfs"],
                    pdf["dls"],
                    pdf["pos_deltas"],
                )
            ):
                if cg is not None:
                    lo = int(np.searchsorted(cg, int(first_doc)))
                    if lo >= cg.size or cg[lo] > int(lasts.iloc[i]):
                        for k in rows:
                            rows[k].append([])
                        continue
                    cand = cg
                else:
                    cand = (
                        np.sort(np.asarray(cands.iloc[i], dtype=np.int64))
                        if with_cand
                        else None
                    )
                doc_ids, sids, tfs, dls, poss = _decode_one(
                    first_doc, n, enc, db, sb, tb, lb, pb, with_pos, cand
                )
                rows["doc_ids"].append(doc_ids.tolist())
                rows["sids"].append(sids.tolist())
                rows["tfs"].append(tfs.tolist())
                rows["dls"].append(dls.tolist())
                rows["poss"].append(poss if with_pos else [])
            yield pd.DataFrame(rows)

    return F.pandas_udf(fn, _DECODED_SCHEMA)


def decoded_postings(
    blocks_df,
    with_pos: bool,
    with_block: bool = False,
    cand_col: str | None = None,
    cand_global=None,
):
    """blocks_df: (term, df, block struct fields...) → exploded
    (term, df, doc_id, sid, tf, dl[, positions]) — the explode and field
    projection stay JVM-side.  ``with_block=True`` carries the block's
    ``first_doc_id`` through as ``_blk`` so a later pass can semi-join
    back to exactly the blocks a row set came from (the two-phase
    positional decode in ``SearchEngine._scored_term_doc``).
    ``cand_col`` names an array<long> column of candidate doc ids for the
    block: only those rows are emitted (mask applied INSIDE the UDF,
    before position materialization and Arrow transfer).  ``cand_global``
    is a sorted int64 array applied to every block (closure-captured;
    blocks with no candidate in range skip decode entirely)."""
    udf = make_decode_udf(
        with_pos, with_cand=cand_col is not None, cand_global=cand_global
    )
    has_excl = "_excl" in blocks_df.columns
    struct_cols = [
        "first_doc_id", "n", "enc", "doc_deltas", "sids", "tfs", "dls", "pos_deltas"
    ]
    if cand_global is not None:
        struct_cols.append("last_doc_id")
    if cand_col is not None:
        struct_cols.append(F.col(cand_col).alias("_cand"))
    d = blocks_df.withColumn("d", udf(F.struct(*struct_cols)))
    if with_pos:
        row_expr = (
            "transform(d.doc_ids, (x, i) -> struct(x as doc_id, d.sids[i] as sid,"
            " d.tfs[i] as tf, d.dls[i] as dl, d.poss[i] as positions))"
        )
    else:
        row_expr = (
            "transform(d.doc_ids, (x, i) -> struct(x as doc_id, d.sids[i] as sid,"
            " d.tfs[i] as tf, d.dls[i] as dl))"
        )
    keep = ["term", "df"] + (
        [F.col("first_doc_id").alias("_blk")] if with_block else []
    )
    out = d.select(
        *keep,
        *(["_excl"] if has_excl else []),
        F.explode(F.expr(row_expr)).alias("p"),
    ).select(
        "term",
        "df",
        *(["_blk"] if with_block else []),
        *(["_excl"] if has_excl else []),
        "p.*",
    )
    if has_excl:
        out = _apply_excl(out, blocks_df).drop("_excl")
    return out


def _apply_excl(rows, blocks_df):
    """Doc-level tombstone mask (blockrows append-only commits): a
    ``_excl`` column on the blocks frame — array of tombstoned doc ids
    overlapping the block's [first, last] range, attached at index READ
    time (blockrows.read_index_block_rows) — drops dead docs' postings
    right after decode, JVM-side.  Blocks with no overlap carry null and
    cost one null check.  Exactness: tf/dl of survivors are unchanged,
    df/idf come from the (exactly delta-merged) dictionary, so scores
    equal a full rebuild's; only stale block max_score remains, which
    bounds_exact=False already handles."""
    if "_excl" not in blocks_df.columns:
        return rows
    return rows.filter(
        F.col("_excl").isNull() | ~F.array_contains("_excl", F.col("doc_id"))
    )
