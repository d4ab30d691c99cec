"""Deduplication operators for large-scale training-data pipelines.

All Spark-first: built-in functions where possible (hashing, shingling and
banding are pure Column expressions → whole-stage codegen), shuffles only on
the band-bucket join, which is the standard LSH trick to avoid the O(n²)
pair space.

Hash choice: md5 hex strings (F.md5) — deterministic, engine-independent
(the DuckDB oracle can reproduce it), and uniform enough for MinHash.  At
100 TB the band-bucket join keys are (band, minhash) — high cardinality,
well-distributed, no skew salting needed; exact-dup groups key on the full
content hash which is unique per distinct document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from groonga_spark.ops.common import spread


def exact_fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fp) — exact-duplicate fingerprint (hash-groupBy dedup basis)."""
    return df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of exact duplicates: (fp, n_docs, min_id) for groups with >1."""
    return (
        exact_fingerprints(df, text_col, id_col)
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def word_shingles(df: DataFrame, text_col: str = "text", k: int = 3):
    """Adds ``shingles: array<string>`` — k-word shingles, JVM-side."""
    return df.withColumn(
        "shingles",
        F.expr(
            f"CASE WHEN size(split({text_col}, ' ')) < {k} THEN array()"
            f" ELSE transform(sequence(1, size(split({text_col}, ' ')) - {k - 1}),"
            f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {k}))) END"
        ),
    )


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    k: int = 3,
    r: int = 1,
) -> DataFrame:
    """(id, band, minhash) — MinHash-LSH banding over k-word shingles with
    ``r`` hash rows per band (minhash = the r per-row minima concatenated).
    Candidate duplicates share (band, minhash).  r=1 is the loosest sieve;
    on low-entropy corpora the global-minimum shingle dominates and buckets
    collapse into giant candidate cliques (the pair join degenerates toward
    O(n²)) — r>=2 multiplies the per-band collision probability s^r and
    keeps buckets small.

    Hashing: ONE md5 per shingle; the n_bands*r hash functions are derived
    by double hashing (Kirsch–Mitzenmacher 2006): h_i = h1 + i*h2 where
    h1/h2 are the two md5 halves truncated to 60 bits (15 hex chars), so
    h1 + 7*h2 < 2^63 never overflows int64 — hence the n_bands*r <= 8
    bound.  All bands come out of one projection (explode over the band
    structs), so the source is scanned once, not n_bands times — vs the
    naive per-(band,row) md5 this is 8x less hashing and 4x less scan."""
    if n_bands * r > 8:
        raise ValueError("n_bands * r must be <= 8 (int64 overflow bound)")
    sh = word_shingles(spread(df), text_col, k).filter(F.size("shingles") > 0)
    h1 = "cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)"
    h2 = "cast(conv(substr(md5(s), 17, 15), 16, 10) as bigint)"
    hs = sh.withColumn(
        "hs", F.expr(f"transform(shingles, s -> struct({h1} AS h1, {h2} AS h2))")
    )
    band_structs = []
    for b in range(n_bands):
        mins = [
            F.array_min(
                F.expr(f"transform(hs, p -> p.h1 + {b * r + j}L * p.h2)")
            ).cast("string")
            for j in range(r)
        ]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"), F.concat_ws("|", *mins).alias("minhash")
            )
        )
    return hs.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bm")
    ).select(id_col, "bm.band", "bm.minhash")


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    k: int = 3,
    r: int = 1,
) -> DataFrame:
    """(a, b) candidate near-duplicate pairs from the band buckets.

    One groupBy on (band, minhash) collects each bucket's ids, then the
    a<b combinations are generated JVM-side from the (small) bucket
    arrays — semantically the classic bucket self-join, but the bands are
    computed ONCE (a self-join would re-evaluate the whole shingle+hash
    pipeline for each side) and the only shuffle is the bucket groupBy.
    Bucket sizes are bounded by the banding itself (r>=2 keeps collision
    probability s^r — see minhash_bands); a bucket of B docs emits B(B-1)/2
    pairs either way, so the join formulation has no scale advantage."""
    mb = minhash_bands(df, text_col, id_col, n_bands, k, r)
    buckets = (
        mb.groupBy("band", "minhash")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids) - i - 1),"
                    " y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """(a, b, jaccard) for pairs with k-shingle Jaccard >= threshold.
    EXACT, via the prefix filter (AllPairs / ppjoin family: Bayardo et al.
    WWW'07, Chaudhuri et al. ICDE'06):

    1. canonical total order on shingles = (global df asc, shingle asc) —
       rarest first;
    2. each doc keeps only its first |S| - ceil(t·|S|) + 1 shingles in that
       order (its *prefix*): any pair with J >= t has overlap >=
       ceil(t·|S|), so by pigeonhole the two prefixes must share a
       shingle;
    3. candidate pairs come from the prefix-only self-join — a boilerplate
       shingle present in most docs is (almost) never in any prefix, so
       the join no longer goes quadratic on stop-shingles;
    4. the true Jaccard is then computed ONLY for candidates by
       re-joining the full shingle sets.

    Identical output to the naive all-shingles join (the filter is
    lossless), but the shuffle is bounded by prefix df, not raw df."""
    sh = (
        word_shingles(spread(df), text_col, k)
        .select(F.col(id_col).alias("id"), F.explode("shingles").alias("s"))
        .distinct()
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))

    # canonical rank within each doc (df asc, s asc) — window per doc id;
    # the global df frame is tiny relative to the corpus and the window
    # partitions by id, so no single-partition funnel
    dfc = sh.groupBy("s").agg(F.count("*").alias("s_df"))
    ranked = (
        sh.join(dfc, "s")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.asc("s_df"), F.asc("s"))
            ),
        )
    )
    prefix = (
        ranked.join(sizes, "id")
        .filter(F.col("rnk") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1)
        .select("id", "s")
    )
    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), "s")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    return _jaccard_on_pairs(sh, sizes, cand).filter(F.col("jaccard") >= threshold)


def _shingle_hashes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, sh) — the DISTINCT 60-bit shingle hashes of each doc (the same
    ``h1`` half ``minhash_bands`` derives its band hashes from, so index
    build and verify share one md5 per shingle).  Jaccard on these hashed
    sets replays engine-independently; md5 collisions are negligible and,
    because both engines hash identically, never cause a divergence."""
    sh = word_shingles(spread(df), text_col, k).select(
        F.col(id_col).alias("id"), F.explode("shingles").alias("s")
    )
    return sh.select(
        "id",
        F.expr("cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)").alias("sh"),
    ).distinct()


class DedupIndex:
    """A persisted near-dup index: the MinHash band table partitioned by
    ``band`` (sorted by minhash within partitions → parquet min/max
    pruning on the bucket join) plus the distinct shingle-hash table used
    for exact-Jaccard verification — the dedup analogue of the posting
    index (build once, probe per delta, append-only growth)."""

    def __init__(self, bands, shingles, n_bands, k, r):
        self.bands = bands
        self.shingles = shingles
        self.n_bands = n_bands
        self.k = k
        self.r = r


def write_dedup_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    k: int = 3,
    r: int = 2,
    mode: str = "overwrite",
) -> DedupIndex:
    """Build (or ``mode='append'``: incrementally extend) the persisted
    dedup index at ``path``.  Appending new docs writes only THEIR bands
    and shingle hashes — the existing index files are untouched, so
    ingest cost is proportional to the delta (grn_ii_update analogue)."""
    spark = df.sparkSession
    if mode == "append":
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        if (int(meta["n_bands"]), int(meta["k"]), int(meta["r"])) != (n_bands, k, r):
            raise ValueError(
                f"append with (n_bands={n_bands}, k={k}, r={r}) against an index "
                f"built with ({meta['n_bands']}, {meta['k']}, {meta['r']})"
            )
    mb = minhash_bands(df, text_col, id_col, n_bands, k, r)
    mb.select(F.col(id_col).alias("id"), "band", "minhash").sortWithinPartitions(
        "minhash"
    ).write.mode(mode).partitionBy("band").parquet(f"{path}/bands")
    _shingle_hashes(df, text_col, id_col, k).write.mode(mode).parquet(
        f"{path}/shingles"
    )
    if mode != "append":
        spark.createDataFrame(
            [(int(n_bands), int(k), int(r))], "n_bands int, k int, r int"
        ).write.mode("overwrite").parquet(f"{path}/meta")
    return load_dedup_index(spark, path)


def load_dedup_index(spark, path: str) -> DedupIndex:
    """Reopen a persisted dedup index."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    return DedupIndex(
        spark.read.parquet(f"{path}/bands"),
        spark.read.parquet(f"{path}/shingles"),
        int(meta["n_bands"]),
        int(meta["k"]),
        int(meta["r"]),
    )


def dedup_against_index(
    new_docs: DataFrame,
    index: DedupIndex,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Drop every new doc whose k-shingle Jaccard against ANY indexed doc
    reaches ``threshold`` — without recomputing anything for the indexed
    corpus.  Shape: the delta's bands equi-join the band table on
    (band, minhash) — the only corpus-sized scan, band-partitioned and
    minhash-sorted so it prunes; verification joins the delta's shingle
    hashes against the stored ones for CANDIDATE ids only (semi-join
    pruned).  Docs re-ingested under their indexed id are not their own
    duplicates (id inequality)."""
    nb = minhash_bands(new_docs, text_col, id_col, index.n_bands, index.k, index.r)
    cand = (
        nb.select(F.col(id_col).alias("b"), "band", "minhash")
        .join(
            index.bands.select(F.col("id").alias("a"), "band", "minhash"),
            ["band", "minhash"],
        )
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    new_sh = _shingle_hashes(new_docs, text_col, id_col, index.k)
    idx_sh = index.shingles.join(
        cand.select(F.col("a").alias("id")).distinct(), "id", "left_semi"
    )
    new_sizes = new_sh.groupBy("id").agg(F.count("*").alias("szb"))
    idx_sizes = idx_sh.groupBy("id").agg(F.count("*").alias("sza"))
    inter = (
        cand.join(idx_sh.select(F.col("id").alias("a"), "sh"), "a")
        .join(new_sh.select(F.col("id").alias("b"), "sh"), ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    dropped = (
        inter.join(idx_sizes.withColumnRenamed("id", "a"), "a")
        .join(new_sizes.withColumnRenamed("id", "b"), "b")
        .filter(
            F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
            >= threshold
        )
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    return new_docs.join(dropped, id_col, "left_anti")


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — 16-bit SimHash over whitespace tokens, entirely
    JVM-side: each token's 16 hash bits come from the first 4 hex digits of
    md5(token); bit j contributes +tf / -tf to dimension j; simhash bit j is
    the sign.  Deterministic across engines (md5-based)."""
    toks = spread(df).select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    h = tf.withColumn("h", F.conv(F.substring(F.md5("term"), 1, 4), 16, 10).cast("long"))
    dims = []
    for j in range(16):
        bit = F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))
        dims.append(
            F.sum(F.when(bit == 1, F.col("tf")).otherwise(-F.col("tf"))).alias(f"d{j}")
        )
    agg = h.groupBy("id").agg(*dims)
    sim = F.lit(0).cast("long")
    for j in range(16):
        sim = sim + F.when(F.col(f"d{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return agg.select(F.col("id"), sim.alias("simhash"))


def _jaccard_on_pairs(
    sh: DataFrame, sizes: DataFrame, cand: DataFrame
) -> DataFrame:
    """Exact Jaccard for given candidate (a, b) pairs from the distinct
    (id, s) shingle frame — the verification step shared by the prefix
    filter and LSH-candidate paths."""
    inter = (
        cand.join(sh.select(F.col("id").alias("a"), "s"), "a")
        .join(sh.select(F.col("id").alias("b"), "s"), ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sa"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sb"), "b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter"))
        )
        .select("a", "b", "jaccard")
    )


def dedup_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "exact",
    threshold: float = 0.8,
    k: int = 3,
    n_bands: int = 4,
    r: int = 2,
) -> DataFrame:
    """End-to-end corpus deduplication: returns ``df`` with duplicates
    REMOVED (the canonical training-data pipeline step).

    * ``method='exact'`` — hash-groupBy: one survivor (min id) per
      identical text.
    * ``method='minhash'`` — near-dedup: MinHash-LSH band join proposes
      candidate pairs, exact k-shingle Jaccard verifies them, and every
      doc that pairs (J >= threshold) with a SMALLER id is dropped.
      Greedy pairwise semantics, pinned and deterministic: the kept set is
      exactly {d : no verified pair (a, d) with a < d} — NOT transitive-
      closure clustering (at 100 TB the connected-components iteration is
      a separate opt-in; greedy-by-id is what subword/dolma-style
      pipelines ship).  Identical docs always share all bands, so exact
      duplicates are a subset of the candidates.
    * ``method='minhash_cc'`` — same verified pairs, but clustered by
      :func:`connected_components` (transitive closure) and one survivor —
      the minimum id — kept per cluster.  Strictly-fewer-or-equal
      survivors than greedy: a chain a~b, b~c (a!~c) keeps {a, c} under
      greedy but only {a} under cc.
    """
    if method == "exact":
        fp = exact_fingerprints(df, text_col, id_col)
        keep = fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
        return df.join(keep, id_col, "left_semi")
    if method not in ("minhash", "minhash_cc"):
        raise ValueError(method)
    cand = minhash_candidate_pairs(df, text_col, id_col, n_bands, k, r)
    sh = (
        word_shingles(spread(df), text_col, k)
        .select(F.col(id_col).alias("id"), F.explode("shingles").alias("s"))
        .distinct()
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    verified = _jaccard_on_pairs(sh, sizes, cand).filter(
        F.col("jaccard") >= threshold
    )
    if method == "minhash_cc":
        cc = connected_components(verified.select("a", "b"))
        drop = cc.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
        return df.join(drop, id_col, "left_anti")
    drop = verified.select(F.col("b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    bench_text_col: str = "text",
) -> DataFrame:
    """Training-set decontamination: remove every doc that shares ANY
    n-word shingle with the benchmark frame (the standard eval-leakage
    guard of LLM data pipelines; n=13 tokens is the common production
    setting, parameterized here).

    Distributed shape: the benchmark side is eval-set sized (thousands of
    rows) → its distinct shingle set is BROADCAST; the corpus side
    explodes shingles once and left-semi joins against the broadcast to
    find contaminated ids, then one left-anti join removes them.  No
    corpus-side shuffle other than the final anti-join on id."""
    bg = (
        word_shingles(bench, bench_text_col, n)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    dg = word_shingles(spread(docs), text_col, n).select(
        F.col(id_col), F.explode("shingles").alias("s")
    )
    contaminated = (
        dg.join(F.broadcast(bg), "s", "left_semi").select(id_col).distinct()
    )
    return docs.join(contaminated, id_col, "left_anti")


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node's strictly-larger neighbors reconnect to
    the minimum of its closed neighborhood (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14, Alg. 2)."""
    bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    m = F.least(F.min("v").over(w), F.col("u"))
    return (
        bidir.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node's smaller-or-equal neighbors (and the
    node itself) reconnect to the minimum neighbor (ibid., Alg. 3)."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    w = Window.partitionBy("u")
    withm = oriented.withColumn("m", F.min("v").over(w))
    out = withm.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        withm.select("u", F.col("m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame, a: str = "a", b: str = "b", max_iter: int = 50
) -> DataFrame:
    """(id, component) for every node appearing in the ``(a, b)`` edge
    frame; ``component`` is the MINIMUM node id of the node's connected
    component (so it's deterministic and joinable as a canonical-doc key).

    Distributed alternating large-star / small-star (Kiveris et al.,
    SoCC'14): converges in O(log² n) rounds, each round is one shuffle on
    the node id — the graph never funnels through the driver and no
    neighbor list is ever materialized (per-node minima via window
    aggregates, AQE handles degree skew).  Each round is localCheckpointed
    to truncate the iterative lineage, same discipline as ops/bpe.py.

    This is the transitive-closure clustering step layered over any of the
    pair generators here (MinHash-LSH, SimHash, Jaccard): the standard
    canonicalization used by large-scale dedup pipelines before choosing
    one survivor per cluster.
    """
    e = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nxt = _small_star(_large_star(e)).localCheckpoint()
        # fixpoint: the star edge set no longer changes (cheap symmetric
        # check — both frames are already distinct)
        if (
            nxt.count() == e.count()
            and nxt.exceptAll(e).isEmpty()
        ):
            e = nxt
            break
        e = nxt
    # at fixpoint every edge points at its component minimum; centers map
    # to themselves
    nodes = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    centers = e.select(F.col("v").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return nodes.union(centers).distinct()


SIMHASH_BITS = 60  # 15 md5 hex digits — fits signed int64 in Spark AND the
# DuckDB oracle (a full 64-bit value would overflow DuckDB's BIGINT checks)


def simhash60(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — 60-bit SimHash over whitespace tokens, entirely
    JVM-side: each token's 60 hash bits are the first 15 hex digits of
    md5(token); bit j contributes +tf / -tf; simhash bit j is the sign.
    Deterministic across engines (md5-based); the wide hash is what makes
    the banded bucket join (:func:`simhash_dup_pairs`) selective — the r1
    16-bit version had only 256 buckets and its self-join degenerated to
    O(N²/256) at scale."""
    toks = spread(df).select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    h = tf.withColumn(
        "h", F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long")
    )
    dims = []
    for j in range(SIMHASH_BITS):
        bit = F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))
        dims.append(
            F.sum(F.when(bit == 1, F.col("tf")).otherwise(-F.col("tf"))).alias(f"d{j}")
        )
    agg = h.groupBy("id").agg(*dims)
    sim = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        sim = sim + F.when(F.col(f"d{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast(
            "long"
        )
    return agg.select(F.col("id"), sim.alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """(a, b, hamming) near-dup pairs with SimHash hamming distance <=
    max_hamming — EXACT for ``max_hamming < n_bands`` by pigeonhole: split
    the 60-bit hash into ``n_bands`` 15-bit bands; <= max_hamming flipped
    bits cannot touch every band, so at least one band matches verbatim
    and the pair survives the banded equi-join.  The join key (band_id,
    band_value) has 4·2^15 · corpus-dependent cardinality — no 256-bucket
    funnel — and the verify step is one bit_count per candidate."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"banded join is only exact for max_hamming < n_bands "
            f"({max_hamming} >= {n_bands})"
        )
    band_bits = SIMHASH_BITS // n_bands
    mask = (1 << band_bits) - 1
    s = simhash60(df, text_col, id_col)
    # all bands in ONE projection (explode over band structs) — a
    # per-band union would re-evaluate the whole simhash aggregation
    # n_bands times, and the former self-join doubled that again
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * band_bits).bitwiseAND(F.lit(mask)).alias("bv"),
        )
        for b in range(n_bands)
    ]
    bands = s.select(
        "id", "simhash", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "simhash", "bb.band", "bb.bv")
    buckets = (
        bands.groupBy("band", "bv")
        .agg(F.array_sort(F.collect_list(F.struct("id", "simhash"))).alias("xs"))
        .filter(F.size("xs") > 1)
    )
    # a<b pairs from each bucket's sorted members; hamming verified inline
    return (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(xs, (x, i) ->"
                    " transform(slice(xs, i + 2, size(xs) - i - 1),"
                    " y -> struct(x.id AS a, y.id AS b,"
                    " bit_count(x.simhash ^ y.simhash) AS hamming))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
