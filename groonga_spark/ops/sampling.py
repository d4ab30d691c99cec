"""Deterministic sampling / data-mixing operators for training pipelines.

A 100 TB corpus is never trained on verbatim: it is sampled to a token
budget with per-source/per-language mixture weights.  At that scale the
sampling itself must be (a) deterministic — re-running the job yields the
same training set bit-for-bit, (b) shuffle-free where possible, and
(c) exact when the recipe says "n docs per group" or "B tokens per group".

Every operator here keys randomness off ``md5(seed || id)`` truncated to
60 bits — the same engine-independent hash discipline the dedup ops use
(`ops/dedup.py`), so DuckDB oracles reproduce the exact sample.

Scale notes per operator:

* ``hash_sample`` — a pure Column filter (no shuffle, no state),
  evaluated map-side inside whole-stage codegen; a hash is uniform by
  construction, so no row-group statistics can skip data — the cost is
  exactly one scan, which is the floor for any exact sample.
* ``stratified_sample`` (exact n per group) — avoids sorting whole
  groups: an oversampled hash-threshold prefilter (E[survivors] =
  ``oversample * n``) cuts each group to ~O(n) rows BEFORE the
  per-group rank; a per-group survivor count then *verifies* the
  prefilter kept at least n rows and falls back to ranking the full
  group only for the (vanishingly rare) failures — exactness without
  ever wide-sorting a heavy group.  This is the distributed analogue of
  Groonga's partial qsort (db.c:10184-10240): rank only the window you
  will keep.
* ``token_budget_sample`` — a per-group running-total window in hash
  order, but the window never sees a whole heavy group: because the
  hash-threshold prefilter keeps an exact *prefix* of the (hash, id)
  order, running totals over survivors equal running totals over the
  full group, so the quota boundary is found inside a pool of
  E[oversample · budget] tokens per group.  A per-group verification
  (survivor tokens ≥ budget, or the whole group survived) guarantees
  exactness; only failing groups fall back to the full window.
* ``weighted_mix`` — one tiny per-group aggregate (collected: one row
  per group) sets each group's keep-rate; the filter itself is again a
  pure Column predicate.  No shuffle of the data at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 60-bit uniform hash of (seed || id) — fits a signed 64-bit exactly,
# identical in Spark and DuckDB (see oracle helpers in __spark_entry__).
_HASH_BITS = 60
_HASH_SPACE = float(1 << _HASH_BITS)


def _hash60(id_col, seed: str):
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", seed: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose 60-bit hash falls
    below ``rate`` of the hash space.  Pure filter — no shuffle, no RNG
    state, stable under retries/resume (the property `F.rand` lacks)."""
    thresh = int(rate * _HASH_SPACE)
    return df.filter(_hash60(id_col, seed) < F.lit(thresh))


def stratified_sample(
    df: DataFrame,
    n_per_group: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "",
    oversample: float = 4.0,
) -> DataFrame:
    """EXACTLY ``min(n, |group|)`` rows per group — the n smallest hashes,
    so the choice is deterministic and independent of physical row order.

    Two-phase exact top-n per group (see module docstring): prefilter to
    E[oversample*n] survivors per group via a hash threshold derived from
    group counts, verify each group still holds ≥ min(n, |group|)
    survivors, and re-rank only failing groups over the full input."""
    h = _hash60(id_col, seed).alias("_h")
    hashed = df.select(group_col, id_col, h)

    counts = hashed.groupBy(group_col).agg(F.count("*").alias("_g"))
    # threshold per group: keep hashes below oversample*n/|g| of the space
    thr = counts.select(
        group_col,
        F.least(
            F.lit(float(_HASH_SPACE)),
            F.lit(oversample * n_per_group) / F.col("_g") * _HASH_SPACE,
        ).alias("_thr"),
        "_g",
    )
    surv = hashed.join(F.broadcast(thr), group_col).filter(F.col("_h") < F.col("_thr"))

    # verify against the FULL group list (a left join, not the survivor
    # frame) so a group whose prefilter kept zero rows still falls back
    sc = counts.join(
        surv.groupBy(group_col).agg(F.count("*").alias("_s")), group_col, "left"
    ).fillna(0, ["_s"])
    bad = sc.filter(F.col("_s") < F.least(F.lit(n_per_group), F.col("_g"))).select(
        group_col
    )
    # rare path: groups whose prefilter under-sampled get ranked in full
    full_bad = hashed.join(F.broadcast(bad), group_col, "left_semi")
    ok = surv.join(F.broadcast(bad), group_col, "left_anti").select(
        group_col, id_col, "_h"
    )
    pool = ok.unionByName(full_bad)

    w = Window.partitionBy(group_col).orderBy("_h", id_col)
    return (
        pool.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .select(group_col, id_col)
    )


def _budget_pool(
    hashed: DataFrame,
    budget: int,
    group_col: str,
    id_col: str,
    oversample: float,
) -> DataFrame:
    """The bounded pool the quota-fill window runs over: a hash-threshold
    prefilter keeping E[oversample · budget] tokens per group, with a
    verified full-group fallback.

    Why this is exact: the prefilter ``_h < thr`` keeps a *prefix* of the
    (``_h``, id) order (the filter depends only on ``_h``, and all rows at
    equal ``_h`` are kept or dropped together), so every survivor's running
    total over the pool equals its running total over the full group.  Any
    row beyond the prefix has a running total ≥ the survivors' token sum,
    so whenever that sum ≥ budget (or the prefix is the whole group) the
    quota boundary provably lies inside the pool.  Groups failing that
    check — vanishingly rare at the default oversample — are re-pooled in
    full."""
    tot = hashed.groupBy(group_col).agg(
        F.count("*").alias("_g"), F.sum("_tok").alias("_gt")
    )
    thr = tot.select(
        group_col,
        F.least(
            F.lit(float(_HASH_SPACE)),
            F.lit(oversample * budget)
            / F.greatest(F.col("_gt").cast("double"), F.lit(1.0))
            * _HASH_SPACE,
        ).alias("_thr"),
        "_g",
    )
    surv = (
        hashed.join(F.broadcast(thr), group_col)
        .filter(F.col("_h") < F.col("_thr"))
        .select(group_col, id_col, "_tok", "_h")
    )
    sc = tot.join(
        surv.groupBy(group_col).agg(
            F.count("*").alias("_s"), F.sum("_tok").alias("_st")
        ),
        group_col,
        "left",
    ).fillna(0, ["_s", "_st"])
    bad = sc.filter((F.col("_s") < F.col("_g")) & (F.col("_st") < budget)).select(
        group_col
    )
    full_bad = hashed.join(F.broadcast(bad), group_col, "left_semi")
    ok = surv.join(F.broadcast(bad), group_col, "left_anti")
    return ok.unionByName(full_bad)


def token_budget_sample(
    df: DataFrame,
    budget: int,
    token_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "",
    oversample: float = 4.0,
) -> DataFrame:
    """Fill each group up to ``budget`` tokens: walk the group's docs in
    hash order and keep every doc that STARTS before the budget is spent
    (running total of previous docs < budget) — the standard quota-fill
    whose output is a deterministic function of the doc set.  The window
    runs over the verified :func:`_budget_pool` prefix, never a whole
    heavy group (see module docstring).  Returns
    (group, id, tokens, cum_tokens)."""
    h = _hash60(id_col, seed).alias("_h")
    hashed = df.select(group_col, id_col, F.col(token_col).cast("long").alias("_tok"), h)
    pool = _budget_pool(hashed, budget, group_col, id_col, oversample)
    w = Window.partitionBy(group_col).orderBy("_h", id_col)
    prev = F.coalesce(
        F.sum("_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        pool.withColumn("_prev", prev)
        .filter(F.col("_prev") < budget)
        .select(
            group_col,
            id_col,
            F.col("_tok").alias("tokens"),
            (F.col("_prev") + F.col("_tok")).alias("cum_tokens"),
        )
    )


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    token_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Mixture sampling: group g gets a token budget ``weights[g] *
    total_tokens`` and a keep-rate ``min(1, budget_g / tokens_g)``; docs
    are then hash-Bernoulli'd at that rate.  E[sampled tokens per group]
    hits the budget without any per-group ordering — the whole op is one
    tiny aggregate (|groups| rows, broadcast back) plus a pure filter, so
    it costs a single map-side pass over 100 TB.  Groups absent from
    ``weights`` get rate 0.  Returns (group, id, tokens, rate)."""
    totals = (
        df.groupBy(group_col).agg(F.sum(F.col(token_col).cast("long")).alias("_tot"))
    )
    wmap = F.create_map(
        *[x for k, v in sorted(weights.items()) for x in (F.lit(k), F.lit(float(v)))]
    )
    rates = totals.select(
        group_col,
        F.least(
            F.lit(1.0),
            F.coalesce(wmap[F.col(group_col)], F.lit(0.0))
            * total_tokens
            / F.col("_tot").cast("double"),
        ).alias("rate"),
    )
    joined = df.join(F.broadcast(rates), group_col)
    keep = _hash60(id_col, seed) < (F.col("rate") * _HASH_SPACE).cast("long")
    return joined.filter(keep).select(
        group_col,
        id_col,
        F.col(token_col).cast("long").alias("tokens"),
        F.round("rate", 6).alias("rate"),
    )
