"""Incremental index update — the Spark re-expression of
``grn_ii_column_update`` (reference lib/ii.c:5120-5338).

Groonga updates one record in place: tokenize the OLD value and the NEW
value, diff the token multisets, and per term insert/delete postings in the
mutable buffer region (``grn_ii_update_one`` / ``grn_ii_delete_one``,
ii.c:3725).  The API therefore requires the caller to supply the old value —
we keep that contract.

On immutable columnar storage the same semantics become **segment algebra**:

  1. ``tombstones``  = doc ids of all replaced/deleted docs;
  2. ``affected``    = the union of terms of the old and new content — every
     posting row that must change lives under one of these terms, because a
     tombstoned doc's postings appear exactly under its old content's terms;
  3. untouched terms keep their encoded blocks BYTE-IDENTICAL — nothing
     is rewritten.  Their build-time ``max_score`` is stale under the new
     stats, so the returned index sets ``bounds_exact=False`` and pruning
     consumers derive a looser-but-sound bound query-time from the stored
     (df, max_tf) alone (idf(N', df) · tfc(max_tf, dl=1, max avgdl') —
     :func:`derived_bound_expr`);
  4. affected terms are decoded, tombstoned rows dropped, new rows unioned
     in, and re-encoded with exact block-max bounds (same path as the full
     build — merge_hit_blocks semantics, ii.c:7578);
  5. dictionary / doclens / stats are exactly recomputed by delta merge,
     so query scores are **identical to a full rebuild** (BM25 inputs N,
     df, tf, dl, Σdl are all exact).

Scale: the shuffle touches only the affected terms' postings plus the delta
docs' tokens; a 0.1% daily churn on a 10^12-file corpus re-encodes ~the
churn's term neighborhood, not the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import scoring
from .build import (
    DEFAULT_N_PBUCKETS,
    DEFAULT_POSTINGS_PER_BUCKET,
    IndexStats,
    InvertedIndex,
    encode_postings,
    salted_tf,
    tf_stage,
)

def derived_bound_expr(n_docs: int, avgdl_max: float) -> str:
    """A sound ``max_score`` upper bound under NEW corpus stats, derivable
    per exploded block row from its stored ``df`` and ``max_tf`` alone
    (no decode, no block rewrite): idf is exact (df unchanged for
    untouched terms), and tfc(tf, dl) ≤ tfc(max_tf, dl=1) evaluated at the
    largest per-section avgdl (tfc is increasing in tf and in avgdl,
    decreasing in dl ≥ 1).  Looser than the build's exact per-block max,
    so block-max pruning stays correct, merely less selective.

    r4 design change: the r3 shape (`_rebound_blocks`) REWROTE every
    untouched block's max_score inside the blocks array at update time —
    an O(index) transform that made a 0.1% churn cost more wall-time than
    a full rebuild (measured; see BASELINE.md incremental row).  Untouched
    blocks are now kept byte-identical (`InvertedIndex.bounds_exact =
    False`) and pruning consumers apply THIS expression query-time
    instead."""
    k1, b = scoring.K1, scoring.B
    idf = f"ln(1.0 + ({float(n_docs)} - df + 0.5) / (df + 0.5))"
    tfc = (
        f"(max_tf * {k1 + 1.0}) / "
        f"(max_tf + {k1} * (1.0 - {b} + {b} * 1.0 / {float(avgdl_max)}))"
    )
    return f"({idf}) * ({tfc})"


def apply_update(
    index: InvertedIndex,
    old_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    postings_per_bucket: int = DEFAULT_POSTINGS_PER_BUCKET,
    n_pbuckets: int = DEFAULT_N_PBUCKETS,
) -> InvertedIndex:
    """Apply an upsert/delete batch to ``index``.

    ``old_docs``: the PREVIOUS content of every doc being replaced or
    deleted (grn_ii_column_update's oldvalue).  ``new_docs``: the new
    content of replaced + newly added docs (newvalue).  A doc id present
    only in ``old_docs`` is a delete; only in ``new_docs`` an insert; in
    both, a replace.  Preconditions: old_docs ids ⊆ indexed ids; new-only
    ids are not already indexed.
    """
    text_cols = [index.stats.sections[sid] for sid in sorted(index.stats.sections)]
    tok = index.tokenizer

    rem_tf, _rem_dl = tf_stage(old_docs, text_cols, tok, id_col, index.token_filters)
    add_tf, add_dl = tf_stage(new_docs, text_cols, tok, id_col, index.token_filters)
    tomb = old_docs.select(F.col(id_col).alias("doc_id")).distinct()

    # ---- doclens + stats (exact) -----------------------------------------
    doclens = index.doclens.join(tomb, "doc_id", "left_anti").unionByName(add_dl)
    n_old_ids = tomb.count()
    n_new_ids = new_docs.select(id_col).distinct().count()
    n_docs = index.stats.n_docs - n_old_ids + n_new_ids
    sec_rows = doclens.groupBy("sid").agg(F.sum("dl").alias("total")).collect()
    stats = IndexStats(
        n_docs=int(n_docs),
        section_tokens={int(r["sid"]): int(r["total"]) for r in sec_rows},
        sections=dict(index.stats.sections),
    )
    avgdl_by_sid = {sid: stats.avgdl(sid) for sid in stats.section_tokens}

    # ---- dictionary delta merge ------------------------------------------
    rem_d = rem_tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("rdf"),
        F.sum("tf").cast("long").alias("rcf"),
    )
    add_d = add_tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("adf"),
        F.sum("tf").cast("long").alias("acf"),
    )
    delta = rem_d.join(add_d, "term", "full_outer")
    merged = (
        index.dictionary.select("term", "df", "cf")
        .join(delta, "term", "full_outer")
        .select(
            "term",
            (
                F.coalesce("df", F.lit(0))
                - F.coalesce("rdf", F.lit(0))
                + F.coalesce("adf", F.lit(0))
            ).alias("df"),
            (
                F.coalesce("cf", F.lit(0))
                - F.coalesce("rcf", F.lit(0))
                + F.coalesce("acf", F.lit(0))
            ).alias("cf"),
        )
        .filter(F.col("df") > 0)
        .withColumn("rterm", F.reverse(F.col("term")))
    )
    dictionary = merged

    # ---- postings: keep / re-encode split --------------------------------
    from ..query.decode import decoded_postings

    affected = delta.select("term")
    # untouched terms' blocks stay BYTE-IDENTICAL (the immutable-segment
    # contract; at 10^12 files this is what keeps the update
    # churn-proportional) — their build-time max_score becomes stale
    # w.r.t. the new stats, so the returned index carries
    # bounds_exact=False and pruning consumers derive bounds query-time
    # (derived_bound_expr above)
    keep = index.postings.join(F.broadcast(affected), "term", "left_anti")
    touched = (
        index.postings.join(F.broadcast(affected), "term")
        .select("term", "df", F.explode("blocks").alias("b"))
        .select("term", "df", "b.*")
    )
    from .build import _pos_bytes_udf

    dec = (
        decoded_postings(touched, with_pos=True)
        .join(tomb, "doc_id", "left_anti")
        .select(
            "term",
            "doc_id",
            "sid",
            F.col("tf").cast("long").alias("tf"),
            _pos_bytes_udf(F.col("positions")).alias("pos_bytes"),
        )
    )
    merged_tf = dec.unionByName(
        add_tf.select("term", "doc_id", "sid", F.col("tf").cast("long").alias("tf"), "pos_bytes")
    )
    tf2 = salted_tf(merged_tf, doclens, dictionary, postings_per_bucket, n_pbuckets)
    reenc = encode_postings(tf2, stats.n_docs, avgdl_by_sid)
    postings = keep.unionByName(reenc)

    return InvertedIndex(
        dictionary=dictionary,
        postings=postings,
        doclens=doclens,
        stats=stats,
        tokenizer=tok,
        token_filters=index.token_filters,
        stopwords=index.stopwords,
        n_pbuckets=n_pbuckets,
        bounds_exact=False,
    )
