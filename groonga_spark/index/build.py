"""Offline inverted-index build — the Spark re-expression of
``grn_ii_build`` (reference lib/ii.c:8029-8078; pipeline documented in
SURVEY §3.3).

Groonga's blocked sort-based build (tokenize → block spill → k-way merge by
term → delta+varbyte/PFoR chunks) maps onto Spark stages:

  stage T (tokenize):  vectorized pandas-UDF tokenize → explode →
                       ``groupBy(term, doc_id, sid)`` partial+final hash agg
                       (map-side combine replaces Groonga's per-block local
                       lexicon counters, ii.c:7397-7480)
  stage D (dictionary): ``groupBy(term)`` → df/cf + dense term_id
  stage P (postings):  repartition by (term, salt) — **salting splits heavy
                       terms** (a term with df > postings_per_bucket is
                       spread over ceil(df/bucket) salted reducers; Groonga's
                       analogue is multi-chunk terms, ii.c:7855-7937) — then
                       per-group sort by (doc_id, sid), chunk into blocks of
                       UNIT_SIZE postings, delta+varbyte/PFoR encode, attach
                       block-max metadata (first/last doc id = chunk_info
                       skip data ii.c:2491-2495; max BM25 bound is our WAND
                       addition).

The resulting index is three DataFrames + scalar stats:

  dictionary(term, term_id, df, cf)
  postings(term, pbucket, bucket, n_postings, blocks[...])
  doclens(doc_id, sid, dl)
  stats: n_docs, per-section {total_tokens, avgdl} (exact-integer division)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import encoding, scoring
from ..tokenize import resolve_tokenizer, tokenize_batch

BLOCK_SIZE = encoding.UNIT_SIZE  # 128 postings per block (ii.c:451)
DEFAULT_POSTINGS_PER_BUCKET = 65536
DEFAULT_N_PBUCKETS = 64  # term-hash partition buckets for partition pruning

# The (term, salt) exchange is sized to DATA, not core count: each reduce
# task shuffle-reads and SORTS its whole partition JVM-side before the
# Arrow stream reaches the encode UDF, so with shuffle.partitions = cores
# (the default for small jobs) a multi-million-doc corpus pushes ~GBs
# through every sorter and the 4N arm of the scaling pair runs all of
# them concurrently in one heap — measured as the non-scaling residual in
# scaling_2v8_4m_disk.json (C ≈ 192 s at 4M docs).  8M tokens ≈ 4.2M
# postings rows ≈ ~250 MB pre-compression per task — the usual ~128 MB
# compressed-shuffle target; a real cluster sizes reduce partitions the
# same way (bytes / target), never by cluster size.
ENCODE_PARTITION_TOKENS = 8_000_000


def encode_partitions(spark: SparkSession, total_tokens: int) -> int:
    """Data-sized reduce-partition count for the (term, salt) exchange:
    never below the session's shuffle.partitions (small corpora keep the
    configured granularity), growing with corpus tokens past
    ``ENCODE_PARTITION_TOKENS`` per task."""
    conf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return max(conf, -(-int(total_tokens) // ENCODE_PARTITION_TOKENS))

BLOCK_SCHEMA = StructType(
    [
        StructField("first_doc_id", LongType()),
        StructField("last_doc_id", LongType()),
        StructField("n", IntegerType()),
        StructField("enc", IntegerType()),  # bit0 docs / bit1 tfs / bit2 pos are PFoR
        StructField("doc_deltas", BinaryType()),
        StructField("sids", BinaryType()),
        StructField("tfs", BinaryType()),
        StructField("dls", BinaryType()),  # per-posting section doc length —
        # denormalized at build so query scoring never joins the big doclens
        # table (Groonga keeps norms via lexicon-adjacent stores; at 100 TB a
        # query-time shuffle join on doc_id would dominate latency)
        StructField("pos_deltas", BinaryType()),
        StructField("max_tf", IntegerType()),
        StructField("max_score", DoubleType()),
    ]
)

POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("pbucket", IntegerType()),
        StructField("bucket", IntegerType()),
        StructField("df", LongType()),
        StructField("n_postings", LongType()),
        StructField("blocks", ArrayType(BLOCK_SCHEMA)),
    ]
)


@dataclass
class IndexStats:
    n_docs: int
    section_tokens: dict[int, int]  # sid -> exact total token count
    sections: dict[int, str]  # sid -> column name

    def avgdl(self, sid: int) -> float:
        # a section whose every value tokenized to nothing (all-empty
        # column) has no token total; floor at 1 so BM25's dl/avgdl term
        # stays finite (no posting exists to score anyway)
        if self.n_docs <= 0 or self.section_tokens.get(sid, 0) <= 0:
            return 1.0
        return float(self.section_tokens[sid]) / float(self.n_docs)


@dataclass
class InvertedIndex:
    dictionary: DataFrame
    postings: DataFrame
    doclens: DataFrame
    stats: IndexStats
    tokenizer: str = "bigram"
    # token filters (§2.9): "stem" applies at ADD+GET (TokenFilterStem,
    # plugins/token_filters/stem.c); "stopword" at GET only
    # (TokenFilterStopWord, stop_word.c:143 — stop words stay indexed,
    # queries skip them)
    token_filters: tuple = ()
    stopwords: frozenset = frozenset()
    # modulus of the pbucket column (salted_tf); lets the query engine
    # compute a term's bucket driver-side (hashutil.term_pbucket) and
    # attach a literal pbucket filter = directory-level partition pruning
    # on a checkpoint-loaded index
    n_pbuckets: int = DEFAULT_N_PBUCKETS
    # False after an incremental update (index/update.apply_update):
    # untouched blocks keep their BUILD-time max_score, which is no longer
    # a sound bound under the new corpus stats (idf grows with N) — the
    # pruning consumers (_filtered_blocks) then substitute a query-time
    # derived bound idf'(df)·tfc(max_tf, dl=1, avgdl'_max) instead of ever
    # rewriting the (immutable) blocks.  Exact-scoring paths never read
    # max_score, so this flag affects pruning selectivity only, never
    # results.
    bounds_exact: bool = True

    # query-layout sizing: every query job schedules one task per cached
    # partition of the frame it scans, so a small index persisted at the
    # BUILD parallelism (2x cores) pays ~64 near-empty tasks per stage —
    # measured 40% of warm query latency at the 5k-doc bench scale.  The
    # build keeps its wide repartition (throughput); persist() then
    # re-lays the materialized frames out at a data-sized partition count
    # via a narrow coalesce over the cached wide frame (no recompute).
    # At cluster scale tokens/TOKENS_PER_PART exceeds the build width and
    # the coalesce is a no-op.
    TOKENS_PER_PART = 1_000_000
    DOCS_PER_PART = 500_000

    def _query_parts(self) -> int:
        tokens = sum(self.stats.section_tokens.values())
        return max(8, -(-tokens // self.TOKENS_PER_PART))

    @staticmethod
    def _relayout(df: DataFrame, target: int) -> DataFrame:
        if df.rdd.getNumPartitions() <= target:
            df.count()  # materialize in place
            return df
        wide = df.persist()
        wide.count()
        out = wide.coalesce(target).persist()
        out.count()  # narrow scan of the cached wide frame
        wide.unpersist()
        return out

    def persist(self) -> "InvertedIndex":
        self.dictionary = self._relayout(
            self.dictionary.persist(), self._query_parts()
        )
        self.postings = self._relayout(self.postings.persist(), self._query_parts())
        # doclens is persisted LAZY: the query path never reads it (dls are
        # denormalized into the posting blocks), so its doc-wide shuffle
        # would be pure build-latency waste.  update/checkpoint/doclen-stat
        # consumers materialize it on first use, at a data-sized partition
        # count (coalesce on the lazy frame narrows the agg's reduce stage,
        # which is fine — the agg is one narrow pass over cached tf).
        self.doclens = self.doclens.coalesce(
            max(4, -(-self.stats.n_docs // self.DOCS_PER_PART))
        ).persist()
        return self

    def unpersist(self) -> "InvertedIndex":
        self.dictionary.unpersist()
        self.postings.unpersist()
        self.doclens.unpersist()
        return self


def _tokenize_udf(mode: str, token_filters: tuple = ()):
    ret = StructType(
        [
            StructField("terms", ArrayType(StringType())),
            StructField("poss", ArrayType(IntegerType())),
        ]
    )
    do_stem = "stem" in token_filters
    mode = resolve_tokenizer(mode)  # plugin callables ship in the closure

    def fn(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        from ..stem import stem_terms

        for s in it:
            res = tokenize_batch(s.fillna("").tolist(), mode)
            terms = [stem_terms(r[0]) if do_stem else r[0] for r in res]
            yield pd.DataFrame({"terms": terms, "poss": [r[1] for r in res]})

    return F.pandas_udf(fn, ret)


def _pos_enc_batch(arrs):  # no type hints: `from __future__ import
    # annotations` stringifies them, which pandas_udf can't resolve
    """array<int> sorted positions → varbyte(within-doc gaps) bytes, one
    vectorized encode per Arrow batch (vb_encode_rows)."""
    lst = arrs.tolist()
    lens = np.fromiter((len(a) for a in lst), dtype=np.int64, count=len(lst))
    total = int(lens.sum())
    if total == 0:
        return pd.Series([b""] * len(lst))
    flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in lst])
    prev = np.empty_like(flat)
    prev[1:] = flat[:-1]
    prev[0] = 0
    starts = np.cumsum(lens) - lens
    prev[starts[lens > 0]] = 0  # first position of each doc is absolute
    gaps = (flat - prev).astype(np.uint32)
    return pd.Series(encoding.vb_encode_rows(gaps, lens))


_pos_bytes_udf = F.pandas_udf(_pos_enc_batch, BinaryType())


def tokens_df(
    df: DataFrame,
    text_cols: list[str],
    tokenizer: str,
    id_col: str = "doc_id",
    token_filters: tuple = (),
) -> DataFrame:
    """(doc_id, sid, term, pos) — sid is the 1-based section ordinal
    (WITH_SECTION semantics, groonga.h:314)."""
    tok = _tokenize_udf(tokenizer, token_filters)
    parts = []
    for i, c in enumerate(text_cols):
        t = df.select(
            F.col(id_col).alias("doc_id"), F.lit(i + 1).alias("sid"), tok(F.col(c)).alias("tk")
        )
        # dl (section token count) is known right here — carrying it inline
        # saves stage P a full-width shuffle join back onto doclens
        t = t.select(
            "doc_id",
            "sid",
            F.size("tk.terms").cast("long").alias("dl"),
            F.explode(
                F.expr("transform(tk.terms, (t, i) -> struct(t as term, tk.poss[i] as pos))")
            ).alias("tp"),
        ).select(
            "doc_id", "sid", "dl", F.col("tp.term").alias("term"), F.col("tp.pos").alias("pos")
        )
        parts.append(t)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _encode_batch(
    pdf: pd.DataFrame, n_docs: int, avgdl_by_sid: dict[int, float]
) -> list[dict]:
    """Encode ALL complete (term, salt) groups of one sorted frame into
    postings rows.  Mirrors merge_hit_blocks + grn_p_encv (ii.c:7578-7676):
    per-block delta encode, varbyte vs PFoR per vector, block-max BM25
    bound — but every array computation (deltas, per-block maxima via
    ``reduceat``, the single varbyte pass per field via ``vb_encode_rows``,
    in-group df counting, tfc) runs ONCE per frame rather than per group:
    at ~1.2M mostly-tiny groups per 1M docs, per-group numpy-call overhead
    (~1 ms each) was the entire encode-stage cost."""
    n = len(pdf)
    terms = pdf["term"].to_numpy()
    salts = pdf["salt"].to_numpy()
    docs = pdf["doc_id"].to_numpy(dtype=np.int64)
    sids = pdf["sid"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    dfs = pdf["df"].to_numpy(dtype=np.int64)
    pbuckets = pdf["pbucket"].to_numpy(dtype=np.int64)
    pos_list = pdf["pos_bytes"].tolist()

    gchange = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
    g_starts = np.concatenate(([0], np.nonzero(gchange)[0] + 1))
    g_ends = np.concatenate((g_starts[1:], [n]))
    g_sizes = g_ends - g_starts

    # block boundaries: every group start is a block start; further starts
    # every BLOCK_SIZE rows within a group
    goff = np.arange(n, dtype=np.int64) - np.repeat(g_starts, g_sizes)
    bstart_mask = (goff % BLOCK_SIZE) == 0
    b_starts = np.nonzero(bstart_mask)[0]
    b_ends = np.concatenate((b_starts[1:], [n]))
    blk_len = b_ends - b_starts
    g_of_block = np.searchsorted(g_starts, b_starts, side="right") - 1

    # per-row streams (block-relative doc deltas: first delta of a block 0)
    deltas = np.empty(n, dtype=np.int64)
    deltas[1:] = docs[1:] - docs[:-1]
    deltas[b_starts] = 0
    deltas = deltas.astype(np.uint32)
    tf_enc = (tfs - 1).astype(np.uint32)  # tf-1 (ii.c:7446)
    sid_enc = (sids - 1).astype(np.uint32)
    dl_enc = dls.astype(np.uint32)

    # per-block aggregates
    max_delta = np.maximum.reduceat(deltas, b_starts)
    max_tf_enc = np.maximum.reduceat(tf_enc, b_starts)
    max_tf = np.maximum.reduceat(tfs, b_starts)

    # df: broadcast value for heavy terms; counted in-group for light ones
    # (sentinel -1 — every posting of a light term is in its single group)
    newdoc = np.empty(n, dtype=np.int64)
    newdoc[0] = 1
    newdoc[1:] = (docs[1:] != docs[:-1]).astype(np.int64)
    newdoc[g_starts] = 1
    g_distinct = np.add.reduceat(newdoc, g_starts)
    g_df = dfs[g_starts]
    g_df = np.where(g_df < 0, g_distinct, g_df)

    # block-max BM25 bound (WAND metadata; generalizes chunk_info.dgap)
    g_idf = np.log(1.0 + (float(n_docs) - g_df + 0.5) / (g_df + 0.5))
    max_sid = int(sids.max()) if n else 1
    avgdl_arr = np.ones(max_sid + 1, dtype=np.float64)
    for s, a in avgdl_by_sid.items():
        if s <= max_sid:
            avgdl_arr[s] = a
    tfc = tfs * (scoring.K1 + 1.0) / (
        tfs + scoring.K1 * (1.0 - scoring.B + scoring.B * dls / avgdl_arr[sids])
    )
    blk_max_score = g_idf[g_of_block] * np.maximum.reduceat(tfc, b_starts)

    # PFoR choice per vector (choose_encoding: n>=16 and n > max>>8)
    pfor_doc = (blk_len >= 16) & (blk_len > (max_delta.astype(np.int64) >> 8))
    pfor_tf = (blk_len >= 16) & (blk_len > (max_tf_enc.astype(np.int64) >> 8))

    # one vectorized varbyte pass per field, split per block
    doc_vb = encoding.vb_encode_rows(deltas, blk_len)
    tf_vb = encoding.vb_encode_rows(tf_enc, blk_len)
    sid_vb = encoding.vb_encode_rows(sid_enc, blk_len)
    dl_vb = encoding.vb_encode_rows(dl_enc, blk_len)

    # per-block position-stream concat via one buffer + cumulative offsets
    pos_lens = np.fromiter((len(b) for b in pos_list), dtype=np.int64, count=n)
    pos_cum = np.concatenate(([0], np.cumsum(pos_lens)))
    pos_all = b"".join(pos_list)

    first_doc = docs[b_starts]
    last_doc = docs[b_ends - 1]

    # assembly (python-level only: dict construction for Arrow)
    out: list[dict] = []
    bi = 0
    n_blocks = b_starts.size
    for gi in range(g_starts.size):
        ge = g_ends[gi]
        blocks = []
        while bi < n_blocks and b_starts[bi] < ge:
            enc = 0
            doc_b = doc_vb[bi]
            if pfor_doc[bi]:
                enc |= 1
                doc_b = encoding.pfor_encode(deltas[b_starts[bi] : b_ends[bi]])
            tf_b = tf_vb[bi]
            if pfor_tf[bi]:
                enc |= 2
                tf_b = encoding.pfor_encode(tf_enc[b_starts[bi] : b_ends[bi]])
            blocks.append(
                {
                    "first_doc_id": int(first_doc[bi]),
                    "last_doc_id": int(last_doc[bi]),
                    "n": int(blk_len[bi]),
                    "enc": enc,
                    "doc_deltas": bytes(doc_b),
                    "sids": bytes(sid_vb[bi]),
                    "tfs": bytes(tf_b),
                    "dls": bytes(dl_vb[bi]),
                    "pos_deltas": pos_all[pos_cum[b_starts[bi]] : pos_cum[b_ends[bi]]],
                    "max_tf": int(max_tf[bi]),
                    "max_score": float(blk_max_score[bi]),
                }
            )
            bi += 1
        out.append(
            {
                "term": terms[g_starts[gi]],
                "pbucket": int(pbuckets[g_starts[gi]]),
                "bucket": int(salts[g_starts[gi]]),
                "df": int(g_df[gi]),
                "n_postings": int(g_sizes[gi]),
                "blocks": blocks,
            }
        )
    return out


_TF_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("doc_id", LongType()),
        StructField("sid", IntegerType()),
        StructField("tf", LongType()),
        StructField("dl", LongType()),
        StructField("pos_bytes", BinaryType()),
    ]
)


def _doc_tf_batch(
    ids: np.ndarray, texts: list[str], sid: int, mode: str, do_stem: bool
) -> pd.DataFrame:
    """Per-doc (term → tf, gap+varbyte positions, dl) for one Arrow batch —
    all vectorized: factorize the flat term stream, group by the composite
    (doc, term_code) int key with one stable lexsort, then one batch-wide
    varbyte encode.  tf is a PER-DOCUMENT aggregate (Groonga likewise counts
    per-document during tokenize, ii.c:7397-7480), so it never needs a
    shuffle — computing it here keeps the exploded token stream out of the
    JVM entirely: one Python crossing instead of two, and no groupBy
    exchange of 40+ raw token rows per doc."""
    from ..stem import stem_terms

    res = tokenize_batch(texts, mode)
    if do_stem:
        res = [(stem_terms(t), p) for t, p in res]
    n_tok = np.fromiter((len(r[0]) for r in res), dtype=np.int64, count=len(res))
    total = int(n_tok.sum())
    if total == 0:
        return pd.DataFrame(
            {c.name: pd.Series(dtype=object) for c in _TF_SCHEMA.fields}
        )
    flat_terms: list[str] = []
    for t, _ in res:
        flat_terms.extend(t)
    pos = np.concatenate([np.asarray(p, dtype=np.int64) for _, p in res if p])
    doc_idx = np.repeat(np.arange(len(res), dtype=np.int64), n_tok)

    codes, uniques = pd.factorize(np.asarray(flat_terms, dtype=object))
    key = doc_idx * len(uniques) + codes
    order = np.lexsort((pos, key))
    skey = key[order]
    spos = pos[order]
    change = np.nonzero(skey[1:] != skey[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    counts = np.diff(np.concatenate((starts, [total])))

    prev = np.empty_like(spos)
    prev[1:] = spos[:-1]
    prev[starts] = 0  # first position of each group is absolute
    gaps = (spos - prev).astype(np.uint32)
    pos_b = encoding.vb_encode_rows(gaps, counts)

    g_doc = doc_idx[order[starts]]
    dls = n_tok[g_doc]
    return pd.DataFrame(
        {
            "term": uniques[codes[order[starts]]],
            "doc_id": ids[g_doc],
            "sid": np.full(starts.size, sid, dtype=np.int32),
            "tf": counts,
            "dl": dls,
            "pos_bytes": pos_b,
        }
    )


def tf_stage(
    df: DataFrame,
    text_cols: list[str],
    tokenizer: str,
    id_col: str = "doc_id",
    token_filters: tuple = (),
):
    """Stage T: one fused ``mapInPandas`` pass — tokenize, per-doc tf
    aggregation, and gap+varbyte position encoding all happen inside a
    single Python crossing, emitting final (term, doc_id, sid, tf, dl,
    pos_bytes) rows.  No token-level explode ever reaches the JVM and no
    shuffle happens here at all: tf/dl/positions are per-document facts.
    (The measured alternative — explode + groupBy + two pandas UDFs — was
    kernel-bound on Arrow socket traffic and ran at single-core speed
    regardless of parallelism.)  ``doclens`` derives from tf with one
    narrow-column exchange."""
    do_stem = "stem" in token_filters
    tokenizer = resolve_tokenizer(tokenizer)  # plugin callables ship in closure

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            for i, c in enumerate(text_cols):
                out = _doc_tf_batch(
                    ids, pdf[c].fillna("").tolist(), i + 1, tokenizer, do_stem
                )
                if len(out):
                    yield out

    # a dotted text col (struct field, e.g. a denormalized reference's
    # owner.name) keeps its dotted name via an alias so the Arrow batch
    # column lookup matches the section name
    tf = df.select(
        id_col, *[F.col(c).alias(c) for c in text_cols]
    ).mapInPandas(fn, _TF_SCHEMA)
    doclens = tf.groupBy("doc_id", "sid").agg(F.sum("tf").cast("long").alias("dl"))
    return tf, doclens


def collect_stats(
    df: DataFrame, doclens: DataFrame, text_cols: list[str], tf: DataFrame | None = None
) -> IndexStats:
    """Σ tokens per section + n_docs.  When ``tf`` is given the sums come
    from it directly (partial-agg collapses to one row per section per
    partition — no doc-level shuffle), leaving ``doclens`` LAZY: the build
    hot path then never materializes the 1-row-per-(doc,section) frame at
    all; consumers that need it (engine persist, checkpoint write) compute
    it on first use."""
    n_docs = df.count()
    if tf is not None:
        sec_rows = tf.groupBy("sid").agg(F.sum("tf").alias("total")).collect()
    else:
        sec_rows = doclens.groupBy("sid").agg(F.sum("dl").alias("total")).collect()
    section_tokens = {int(r["sid"]): int(r["total"]) for r in sec_rows}
    return IndexStats(
        n_docs=int(n_docs),
        section_tokens=section_tokens,
        sections={i + 1: c for i, c in enumerate(text_cols)},
    )


def make_dictionary(tf: DataFrame, single_section: bool = False) -> DataFrame:
    """Stage D: df/cf per term.  No dense term_id: the engine keys postings
    by the term string itself (Groonga needs a tid to index its mmap arrays,
    lib/ii.c; a columnar engine doesn't) — skipping the id assignment drops
    four driver-synchronized jobs and a window shuffle from the hot build
    path.  ``dense_term_ids`` recovers PAT-key-ordered ids on demand.

    ``single_section``: with one text column, tf has exactly one row per
    (term, doc), so ``count(*)`` equals ``countDistinct(doc_id)`` — a plain
    partial-aggregating count instead of the two-phase distinct."""
    df_expr = (
        F.count("*") if single_section else F.countDistinct("doc_id")
    )
    dictionary = tf.groupBy("term").agg(
        df_expr.cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    # rterm = reversed term: suffix search becomes a prefix predicate on a
    # sortable column (the PAT+SIS suffix-index analogue, pat.c:1023) —
    # a range scan instead of a full-dictionary endswith at scale
    return dictionary.withColumn("rterm", F.reverse(F.col("term")))


def dense_term_ids(dictionary: DataFrame) -> DataFrame:
    """Attach dense 1..N ``term_id`` in term sort order (PAT-key order
    analogue) — on demand, outside the build hot path."""
    from ..ids import assign_dense_ids

    return assign_dense_ids(dictionary, ["term"], "term_id")


def salted_tf(
    tf: DataFrame,
    doclens: DataFrame,
    dictionary: DataFrame,
    postings_per_bucket: int = DEFAULT_POSTINGS_PER_BUCKET,
    n_pbuckets: int = DEFAULT_N_PBUCKETS,
    single_section: bool = False,
    heavy: DataFrame | None = None,
) -> DataFrame:
    """Attach dl, df, salt and pbucket.  The salt spreads a heavy term's
    docs over ceil(df / postings_per_bucket) reducers — explicit skew split;
    pbucket = hash(term) % n_pbuckets gives partition pruning on the
    persisted postings table.

    Scale notes: only HEAVY terms (df > postings_per_bucket — the Zipf
    head, a bounded set) need a pre-known df to pick their salt count, so
    just those are broadcast; every light term's postings land whole in one
    encode group, where its exact df is counted in-group (sentinel df=-1
    here).  The full dictionary is never shuffle-joined onto tf — at 10^12
    docs the dictionary has billions of terms and that join would double
    the build's shuffle volume.  ``dl`` likewise rides inline from stage T
    (known at tokenize time) instead of a shuffle join onto doclens, so
    stage P performs exactly ONE wide exchange: the repartition by
    (term, salt)."""
    if heavy is not None:
        # caller already holds a materialized df-per-term frame (the
        # single-section fused build derives it from the cached dictionary)
        # — reuse it instead of re-scanning tf
        pass
    elif single_section:
        # One section ⇒ each tf row is a distinct doc, so postings-per-term
        # == df exactly and a plain count(*) — cheap partial-aggregating
        # counts, no distinct — replaces the dictionary's two-phase
        # countDistinct job on the blocking path to the encode stage.
        heavy = (
            tf.groupBy("term")
            .agg(F.count("*").alias("_heavy_df"))
            .filter(F.col("_heavy_df") > postings_per_bucket)
        )
    else:
        heavy = dictionary.filter(F.col("df") > postings_per_bucket).select(
            "term", F.col("df").alias("_heavy_df")
        )
    out = tf
    if "dl" not in tf.columns:  # pre-inline-dl callers (decoded legacy tf)
        out = out.join(doclens, ["doc_id", "sid"])
    return (
        out.join(F.broadcast(heavy), "term", "left")
        .withColumn("df", F.coalesce(F.col("_heavy_df"), F.lit(-1)).cast("long"))
        .drop("_heavy_df")
        .withColumn(
            "n_salts",
            F.when(
                F.col("df") > postings_per_bucket,
                F.ceil(F.col("df") / F.lit(postings_per_bucket)),
            )
            .otherwise(F.lit(1))
            .cast("int"),
        )
        .withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.col("n_salts")).cast("int"))
        .withColumn("pbucket", F.pmod(F.xxhash64("term"), F.lit(n_pbuckets)).cast("int"))
    )


_ENC_COLS = ["term", "pbucket", "salt", "df", "doc_id", "sid", "tf", "dl", "pos_bytes"]


def encode_postings(
    tf2: DataFrame,
    n_docs: int,
    avgdl_by_sid: dict[int, float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Stage P: per-(term, salt) block encode (merge_hit_blocks analogue).

    Physical strategy: hash-repartition by (term, salt) so each group lands
    whole in one partition, sort within partitions, then ``mapInPandas``
    streaming Arrow batches with a carry-over buffer for the group that
    spans a batch boundary.  One pandas frame per Arrow batch instead of
    per group — ``groupBy().applyInPandas`` costs ~1 ms per group in
    conversion overhead, which at 267k mostly-tiny term groups dwarfs the
    actual varbyte/PFoR work."""
    spark = tf2.sparkSession
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    part = tf2.select(*_ENC_COLS).repartition(nparts, "term", "salt").sortWithinPartitions(
        "term", "salt", "doc_id", "sid"
    )
    n_docs = int(n_docs)

    def encode_iter(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            terms = pdf["term"].to_numpy()
            salts = pdf["salt"].to_numpy()
            change = np.nonzero((terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1]))[0] + 1
            if change.size == 0:
                carry = pdf  # whole batch is one (possibly spanning) group
                continue
            # hold back the final (possibly batch-spanning) group
            last_start = int(change[-1])
            carry = pdf.iloc[last_start:].reset_index(drop=True)
            rows = _encode_batch(pdf.iloc[:last_start], n_docs, avgdl_by_sid)
            if rows:
                yield pd.DataFrame(rows)
        if carry is not None and len(carry):
            rows = _encode_batch(carry, n_docs, avgdl_by_sid)
            if rows:
                yield pd.DataFrame(rows)

    return part.mapInPandas(encode_iter, POSTINGS_SCHEMA)


def build_index(
    df: DataFrame,
    text_cols: list[str],
    tokenizer: str = "bigram",
    id_col: str = "doc_id",
    postings_per_bucket: int = DEFAULT_POSTINGS_PER_BUCKET,
    n_pbuckets: int = DEFAULT_N_PBUCKETS,
    cache_tf: bool = True,
    token_filters: tuple = (),
    stopwords=frozenset(),
) -> InvertedIndex:
    """In-memory build.  ``cache_tf`` persists the stage-T output so the
    dictionary, stats, and encode stages each read the aggregated token
    frame instead of re-running the tokenize pipeline (4× at 100k docs).
    The production-scale equivalent is ``build_index_checkpointed``, which
    materializes stage T to parquet (Groonga's tmpfile blocks, ii.c:7034)."""
    tf, doclens = tf_stage(df, text_cols, tokenizer, id_col, tuple(token_filters))
    if cache_tf:
        tf = tf.persist()
        doclens = doclens.persist()
    single = len(text_cols) == 1
    heavy = None
    if single and cache_tf:
        # Fused single-section build: ONE aggregation job over tf yields
        # BOTH the section token total (Σcf — no separate groupBy(sid)
        # stats job) and the heavy-term set for salting.  collect_list
        # skips the when()-nulls, and the heavy set is mathematically
        # bounded by total_postings / postings_per_bucket (a term is heavy
        # only past that df), so the collect is a few-thousand-row driver
        # transfer at worst.  The dictionary frame itself stays LAZY — an
        # earlier revision persisted it here and the cache insert competed
        # with the tf cache for memory on the blocking path (measured
        # slower at 1M docs); consumers that need it materialized
        # (query-engine persist, checkpoint) do so themselves.
        agg = tf.groupBy("term").agg(
            F.count("*").cast("long").alias("hdf"),
            F.sum("tf").cast("long").alias("hcf"),
        )
        row = agg.agg(
            F.sum("hcf").alias("tot"),
            F.collect_list(
                F.when(
                    F.col("hdf") > postings_per_bucket,
                    F.struct(F.col("term"), F.col("hdf").alias("_heavy_df")),
                )
            ).alias("hv"),
        ).collect()[0]
        stats = IndexStats(
            n_docs=int(df.count()),
            section_tokens={1: int(row["tot"] or 0)},
            sections={1: text_cols[0]},
        )
        # Guardrail: the heavy set is bounded by total_postings /
        # postings_per_bucket, so a large collect means postings_per_bucket
        # is misconfigured for this corpus — fail loudly before the
        # broadcast instead of silently straining the driver.
        n_heavy = len(row["hv"] or [])
        if n_heavy > 1_000_000:
            raise ValueError(
                f"heavy-term set has {n_heavy} entries (> 1M): "
                f"postings_per_bucket={postings_per_bucket} is too small for "
                "this corpus — raise it so the salting metadata stays a "
                "driver-sized broadcast"
            )
        if n_heavy > 100_000:
            import warnings

            warnings.warn(
                f"heavy-term set has {n_heavy} entries; consider raising "
                f"postings_per_bucket (={postings_per_bucket})",
                stacklevel=2,
            )
        heavy = df.sparkSession.createDataFrame(
            row["hv"] or [], "term string, _heavy_df long"
        )
        dictionary = make_dictionary(tf, single_section=True)
    else:
        stats = collect_stats(df, doclens, text_cols, tf=tf if cache_tf else None)
        dictionary = make_dictionary(tf)
    avgdl_by_sid = {sid: stats.avgdl(sid) for sid in stats.section_tokens}
    tf2 = salted_tf(
        tf,
        doclens,
        dictionary,
        postings_per_bucket,
        n_pbuckets,
        single_section=single,
        heavy=heavy,
    )
    postings = encode_postings(
        tf2,
        stats.n_docs,
        avgdl_by_sid,
        num_partitions=encode_partitions(
            df.sparkSession, sum(stats.section_tokens.values())
        ),
    )
    return InvertedIndex(
        dictionary=dictionary,
        postings=postings,
        doclens=doclens,
        stats=stats,
        tokenizer=tokenizer,
        token_filters=tuple(token_filters),
        stopwords=frozenset(stopwords),
        n_pbuckets=n_pbuckets,
    )
