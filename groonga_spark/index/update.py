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
  4. within affected terms, only the BLOCKS that actually contain a
     tombstoned doc are decoded (exact metadata-only detection: a
     bucketized range join of block [first, last] spans against the
     tombstone set), survivors re-encoded together with the new docs'
     postings (same path as the full build — merge_hit_blocks semantics,
     ii.c:7578); every other block survives with its row's array filtered
     JVM-side, no decode;
  5. dictionary / doclens / stats are exactly recomputed by delta merge,
     so query scores are **identical to a full rebuild** (BM25 inputs N,
     df, tf, dl, Σdl are all exact).

Scale: decode/re-encode volume is O(churn · terms-per-doc · block_size) —
independent of the head terms' posting-list lengths (the r3 term-granular
shape re-encoded every posting of every affected term, and at natural-
language churn the affected set is the Zipf head, which measured SLOWER
than a full rebuild at 0.1% churn / 1M docs; see BASELINE.md).
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


def _update_parts(
    index: InvertedIndex,
    old_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    postings_per_bucket: int = DEFAULT_POSTINGS_PER_BUCKET,
    n_pbuckets: int = DEFAULT_N_PBUCKETS,
    append_only: bool = False,
) -> dict:
    """Shared core of :func:`apply_update` (packed layout) and
    :func:`blockrows.commit_update` (one-block-per-row delta commit).
    Returns every intermediate frame lazily; callers assemble the subset
    their layout needs (the packed path unions untouched/kept/reenc, the
    block-rows path commits ``touched_keys`` as deletes + exploded
    ``reenc`` as appends and never computes ``untouched``/``kept_aff``).
    """
    text_cols = [index.stats.sections[sid] for sid in sorted(index.stats.sections)]
    tok = index.tokenizer

    # The frames below are each consumed by SEVERAL downstream subtrees
    # (the dictionary merge feeds kept_aff, the heavy-df broadcast AND
    # salted_tf; the tf stages feed the dictionary delta, the merge and
    # doclens) — without a persist every materializing action recomputes
    # the full-vocab outer join and the tokenizer UDF once PER REFERENCE,
    # which measured as the dominant cost of an update (the arms are
    # churn- or vocab-sized, so the caches are small by construction).
    rem_tf, _rem_dl = tf_stage(old_docs, text_cols, tok, id_col, index.token_filters)
    add_tf, add_dl = tf_stage(new_docs, text_cols, tok, id_col, index.token_filters)
    rem_tf = rem_tf.persist()
    add_tf = add_tf.persist()
    tomb = old_docs.select(F.col(id_col).alias("doc_id")).distinct()

    # ---- doclens + stats (exact) -----------------------------------------
    doclens = (
        index.doclens.join(tomb, "doc_id", "left_anti")
        .unionByName(add_dl)
        .persist()
    )
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
    dictionary = merged.persist()

    # ---- postings: block-surgical keep / re-encode split -----------------
    # r4 redesign.  The r3 shape decoded + re-encoded EVERY posting of
    # every affected term — but at natural-language churn the affected
    # term set is the Zipf head (any churned doc contains "the"), so the
    # touched posting volume approached the whole index and a 0.1% churn
    # measured SLOWER than a full rebuild.  The unit of work is now the
    # BLOCK: only blocks that actually contain a tombstoned doc are
    # decoded and re-encoded; every other block of an affected term
    # survives inside its row with the array filtered JVM-side (no Python
    # decode, no Arrow crossing) and the row's ``df`` refreshed; new
    # docs' postings append as additional rows per term (decode paths
    # aggregate across rows, so multi-row terms and overlapping block
    # doc-ranges are fine).  Decode volume is now
    # O(churn · terms-per-doc · block-size), independent of the head
    # terms' posting-list lengths — grn_ii's buffer-insert locality
    # (ii.c:3725) re-expressed on immutable segments.
    #
    # Storage note: with the packed blocks-array layout a touched block
    # still dirties its whole (term, pbucket) row on write; the
    # one-block-per-row layout (index/blockrows.py) stores the same
    # blocks as individual rows behind the same TableStorage seam and
    # commits updates as churn-proportional deletes+appends (Iceberg
    # row-level deletes) — its commit path shares this function.
    from ..query.decode import decoded_postings

    affected = delta.select("term")
    if append_only:
        # blockrows append-only commit: NO touched detection, NO decode —
        # old postings stay on disk masked by gen-aware doc tombstones at
        # decode time; only the new docs' postings are encoded.  The
        # dictionary/doclens/stats merges above stay exact, which keeps
        # BM25 scores rebuild-identical (df/idf read from the dictionary
        # on this layout, never from stale rows).
        spark = old_docs.sparkSession
        tf2 = salted_tf(
            add_tf,
            doclens,
            dictionary,
            postings_per_bucket,
            n_pbuckets,
            heavy=dictionary.join(F.broadcast(affected), "term").select(
                "term", F.col("df").alias("_heavy_df")
            ),
        )
        return dict(
            dictionary=dictionary,
            doclens=doclens,
            stats=stats,
            untouched=None,
            kept_aff=None,
            touched_keys=spark.createDataFrame(
                [], "term string, first_doc_id long"
            ),
            reenc=encode_postings(tf2, stats.n_docs, avgdl_by_sid),
            tokenizer=tok,
            tomb=tomb,
            cached=[rem_tf, add_tf, doclens, dictionary],
        )
    prows = getattr(index, "postings_rows", None)
    if prows is not None:
        # block_rows-loaded index: the exploded frame IS the table — read
        # affected blocks straight from it (df attached from the OLD
        # dictionary, as the packed rows carry) and never touch
        # index.postings (a full-table regroup on this layout)
        aff_olddf = index.dictionary.join(F.broadcast(affected), "term").select(
            "term", "df"
        )
        aff_blk = prows.join(F.broadcast(aff_olddf), "term")
        untouched = aff_rows = None  # packed-only frames (see below)
    else:
        untouched = index.postings.join(F.broadcast(affected), "term", "left_anti")
        aff_rows = index.postings.join(F.broadcast(affected), "term")
        aff_blk = aff_rows.select(
            "term", "df", F.explode("blocks").alias("b")
        ).select("term", "df", "b.*")

    # exact touched-block detection on METADATA only, split by span:
    # *narrow* blocks (dense terms — ids packed ~block_size apart) overlap
    # few buckets, so bucketize and equi-join tombstones by bucket, then
    # the exact range test.  A *wide* block (a rare term whose 128
    # postings straddle a large id range) would explode O(span/bucket)
    # rows under that scheme — cost scaling with corpus size, not churn —
    # so wide blocks instead broadcast-range-join the tombstones
    # directly: both sides are churn-proportional (wide blocks ≈ one per
    # rare affected term; tombstones = churned docs), keeping detection
    # churn-proportional at any corpus size.
    _B = 1 << 12
    _WIDE_BKTS = 64
    blk_meta = aff_blk.select("term", "first_doc_id", "last_doc_id")
    n_bkts = (F.col("last_doc_id") / _B).cast("long") - (
        F.col("first_doc_id") / _B
    ).cast("long")
    spans = blk_meta.filter(n_bkts < _WIDE_BKTS).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.col("first_doc_id") / _B).cast("long"),
                (F.col("last_doc_id") / _B).cast("long"),
            )
        ),
    )
    tombk = tomb.select(
        F.col("doc_id").alias("_tid"),
        (F.col("doc_id") / _B).cast("long").alias("_bkt"),
    )
    touched_narrow = (
        spans.join(tombk, "_bkt")
        .filter(
            (F.col("_tid") >= F.col("first_doc_id"))
            & (F.col("_tid") <= F.col("last_doc_id"))
        )
        .select("term", "first_doc_id")
    )
    tomb_b = F.broadcast(tomb.select(F.col("doc_id").alias("_tid")))
    touched_wide = blk_meta.filter(n_bkts >= _WIDE_BKTS).join(
        tomb_b,
        (F.col("_tid") >= F.col("first_doc_id"))
        & (F.col("_tid") <= F.col("last_doc_id")),
    ).select("term", "first_doc_id")
    touched_keys = touched_narrow.unionByName(touched_wide).distinct().persist()
    touched_per_term = touched_keys.groupBy("term").agg(
        F.collect_set("first_doc_id").alias("_tb")
    )

    # kept affected rows (PACKED layout only — block_rows keeps untouched
    # rows by never deleting them): drop touched blocks from the array
    # (JVM filter), refresh df to the post-update dictionary value
    # (scores read df from the decoded rows), drop rows left empty
    # (fully-deleted terms)
    kept_aff = None
    if aff_rows is not None:
        kept_aff = (
            aff_rows.join(touched_per_term, "term", "left")
            .join(
                F.broadcast(dictionary.select("term", F.col("df").alias("_ndf"))),
                "term",
                "left",
            )
            .withColumn(
                "blocks",
                F.when(F.col("_tb").isNull(), F.col("blocks")).otherwise(
                    F.expr(
                        "filter(blocks, bb -> NOT array_contains(_tb, bb.first_doc_id))"
                    )
                ),
            )
            .withColumn("df", F.coalesce(F.col("_ndf"), F.lit(0)).cast("long"))
            .withColumn(
                "n_postings",
                F.expr("aggregate(blocks, 0L, (a, bb) -> a + bb.n)"),
            )
            .drop("_tb", "_ndf")
            .filter(F.size("blocks") > 0)
        )

    touched_blocks = aff_blk.join(
        touched_keys, ["term", "first_doc_id"], "left_semi"
    )
    from .build import _pos_bytes_udf

    dec = (
        decoded_postings(touched_blocks, with_pos=True)
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
    # every affected term's exact NEW df must ride into the encode: the
    # build's in-group df counting (salted_tf sentinel -1) assumes a group
    # holds a term's ENTIRE postings, but these groups hold only the
    # delta — in-group counts would store delta-sized df (and idf-inflated
    # max_score) on the appended rows.  The affected set is churn-vocab-
    # sized, so the broadcast stays small even when the full dictionary
    # would not be.
    aff_df = dictionary.join(F.broadcast(affected), "term").select(
        "term", F.col("df").alias("_heavy_df")
    )
    tf2 = salted_tf(
        merged_tf,
        doclens,
        dictionary,
        postings_per_bucket,
        n_pbuckets,
        heavy=aff_df,
    )
    reenc = encode_postings(tf2, stats.n_docs, avgdl_by_sid)
    return dict(
        dictionary=dictionary,
        doclens=doclens,
        stats=stats,
        untouched=untouched,
        kept_aff=kept_aff,
        touched_keys=touched_keys,
        reenc=reenc,
        tokenizer=tok,
        tomb=tomb,
        # persisted intermediates — callers unpersist once the result is
        # materialized/committed; left cached, successive updates pile up
        # and EVICT the base index's cache (measured as a bistable 95 s →
        # 163 s collapse of the update arm in the 1M A/B)
        cached=[rem_tf, add_tf, doclens, dictionary, touched_keys],
    )


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
    p = _update_parts(
        index, old_docs, new_docs, id_col, postings_per_bucket, n_pbuckets
    )
    if p["untouched"] is not None:
        postings = (
            p["untouched"].unionByName(p["kept_aff"]).unionByName(p["reenc"])
        )
    else:
        # block_rows-loaded index: untouched rows = everything minus the
        # touched keys; regroup_rows attaches the POST-update df (the
        # packed kept_aff's refresh) and inner-joining the new dictionary
        # drops fully-deleted terms' rows.  (The delta-commit path —
        # blockrows.commit_update — never materializes this.)
        if getattr(index, "n_doc_tombstones", 0):
            raise RuntimeError(
                "index has pending doc tombstones (append-only commits): "
                "run blockrows.compact() before apply_update's packed "
                "assembly (the packed shape cannot express the decode-"
                "time mask)"
            )
        from .blockrows import regroup_rows

        live = index.postings_rows.join(
            F.broadcast(p["touched_keys"]),
            ["term", "first_doc_id"],
            "left_anti",
        )
        postings = regroup_rows(live, p["dictionary"]).unionByName(p["reenc"])
    out = InvertedIndex(
        dictionary=p["dictionary"],
        postings=postings,
        doclens=p["doclens"],
        stats=p["stats"],
        tokenizer=p["tokenizer"],
        token_filters=index.token_filters,
        stopwords=index.stopwords,
        n_pbuckets=n_pbuckets,
        bounds_exact=False,
    )
    # the persisted intermediates (see _update_parts); release with
    # release_update_caches(out) once the result is materialized/committed
    out._update_cached = p["cached"]
    return out


def release_update_caches(index: InvertedIndex) -> None:
    """Unpersist the intermediates an apply_update result holds.  Call
    after materializing/committing the result: repeated updates that
    leave these cached evict the BASE index's cache and collapse update
    latency (measured 95 s → 163 s across two reps of the 1M A/B)."""
    for f in getattr(index, "_update_cached", ()):
        try:
            f.unpersist()
        except Exception:
            pass
    index._update_cached = ()
