"""Capture physical-plan evidence for EXPLAIN.md: parquet pushdown /
pruning, broadcast joins on the query path, TakeOrderedAndProject top-k,
single-exchange build. Run: PYTHONPATH=. python tools/explain_plans.py"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groonga_spark.session import get_spark


def grab(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark("explain_plans", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    out = ["# Physical-plan evidence (captured by tools/explain_plans.py)\n"]

    out.append("## Projection + filter pushdown to parquet (scan_topn)\n")
    out.append(
        "Check: `PushedFilters` non-empty, `ReadSchema` only the selected "
        "columns, plan ends in `TakeOrderedAndProject` (Spark's top-k — no "
        "global sort).\n"
    )
    out.append("```\n" + grab(entry.queries()["scan_topn"](spark, sf)) + "```\n")

    out.append("## Fulltext query path (ft_match_and)\n")
    out.append(
        "Check: the tiny query-term set joins the postings table via "
        "`BroadcastHashJoin` (no shuffle of the postings side beyond its "
        "cache), block explode happens AFTER the broadcast semi-filter, and "
        "the final top-k is `TakeOrderedAndProject`.\n"
    )
    out.append("```\n" + grab(entry.queries()["ft_match_and"](spark, sf)) + "```\n")

    out.append("## Build: stage P input (salted tf)\n")
    out.append(
        "Check: ONE `Exchange hashpartitioning(term, salt)` wide shuffle; "
        "the heavy-term df attach is `BroadcastHashJoin` (LeftOuter); dl "
        "rides inline (no join back onto doclens).\n"
    )
    from groonga_spark.corpus import corpus_df
    from groonga_spark.index.build import (
        make_dictionary,
        salted_tf,
        tf_stage,
    )

    corpus = corpus_df(spark, 2000)
    tf, doclens = tf_stage(corpus, ["content"], "code")
    tf2 = salted_tf(tf, doclens, make_dictionary(tf), single_section=True)
    out.append("```\n" + grab(tf2) + "```\n")

    out.append("## Column-operator pushdown (q_col_range)\n")
    out.append(
        "Check: the scalar column operators (`n_chars:>=200 n_chars:<400`) "
        "reach the parquet scan as `PushedFilters` — the whole colop-only "
        "query is a pruned scan + TakeOrderedAndProject, no UDF, no index "
        "touch.\n"
    )
    out.append("```\n" + grab(entry.queries()["q_col_range"](spark, sf)) + "```\n")

    out.append("## Shard-range pruning (logical_select path)\n")
    out.append(
        "Check: the logical_select shard range (`ts >= ... && ts < ...`) "
        "appears in `PushedFilters` of the events scan — on a "
        "ts-partitioned production table these become PartitionFilters "
        "(partition pruning), the shard-walk of the reference's sharding "
        "plugin.\n"
    )
    from groonga_spark.query.script import parse_filter

    ev = spark.read.parquet(f"{sf}/events.parquet")
    lr = (
        ev.filter(parse_filter('ts >= "2024-01-02" && ts < "2024-01-04"'))
        .orderBy("ts")
        .limit(20)
        .select("event_id", "value")
    )
    out.append("```\n" + grab(lr) + "```\n")

    out.append("## Anchor-driven block prune (gates forced at toy scale)\n")
    out.append(
        "Check: the kept-block set is an `InMemoryTableScan` (persisted "
        "once per query — the anchor decode subtree is NOT re-executed "
        "per branch) feeding `BroadcastHashJoin ... LeftSemi` joins over "
        "block METADATA, and those semi-joins sit UPSTREAM of the Python "
        "posting decode (`MapInPandas`) — posting bytes of pruned blocks "
        "are never decoded. Production gates (`ANCHOR_PRUNE_*`) restrict "
        "this to positional plans with a big prunable side (the measured "
        "break-even; see BASELINE.md anchor A/B).\n"
    )
    from groonga_spark.query import engine as eng_mod
    from groonga_spark.query.engine import SearchEngine

    eng_mod.ANCHOR_PRUNE_CUTOFF = -1
    eng_mod.ANCHOR_PRUNE_RATIO = 0
    eng_mod.ANCHOR_PRUNE_COVERAGE = 0
    se = SearchEngine.build(corpus, ["content"], tokenizer="code")
    out.append(
        "```\n"
        + grab(se.select('"merge sort"', k=10, escalate=False))
        + "```\n"
    )

    out.append("## Block-max WAND, phase-2 survivors (gates forced)\n")
    out.append(
        "Check: the surviving-block filter (the driver-side WAND bound "
        "literals + the BMW cell semi-join over block metadata) sits "
        "UPSTREAM of the Python decode (`MapInPandas`); the θ phase ran "
        "at plan-build time (driver collects), so the final frame is one "
        "decode of survivors → hash agg → TakeOrderedAndProject.\n"
    )
    eng_mod.WAND_OR_CUTOFF = -1
    out.append(
        "```\n"
        + grab(se.select("merge OR sort", k=10, escalate=False))
        + "```\n"
    )

    out.append("## Batched query-set serving (select_batch)\n")
    out.append(
        "Check: ONE posting decode (`MapInPandas`) is shared by every "
        "query in the set — the (query_id, term) map joins it via "
        "`BroadcastHashJoin`, and the per-query top-k is a single window "
        "(`RunningWindowFunction`/`Window` over query_id) — ~3 stages for "
        "the whole set instead of Q independent jobs.\n"
    )
    out.append(
        "```\n"
        + grab(
            se.select_batch(
                {"a": "merge sort", "b": "merge OR sort", "c": "partition"},
                k=10,
            )
        )
        + "```\n"
    )

    out.append("## Mixture sampling (mix_weighted_q)\n")
    out.append(
        "Check: the per-group rates frame (|groups| rows) comes back via "
        "`BroadcastHashJoin` and the keep decision is a pure codegen "
        "filter on the scan side — the corpus data itself is never "
        "shuffled; one map pass regardless of corpus size.\n"
    )
    out.append(
        "```\n" + grab(entry.queries()["mix_weighted_q"](spark, sf)) + "```\n"
    )

    out.append("## Exact stratified sample (sample_strat_q)\n")
    out.append(
        "Check: the oversample prefilter (`_h < _thr` after the broadcast "
        "threshold join) cuts each group to ~O(n) rows BEFORE the "
        "row_number window — the per-group sort never sees a heavy "
        "group's full membership; the fallback branch joins against the "
        "(normally empty) under-sampled-group list.\n"
    )
    out.append(
        "```\n" + grab(entry.queries()["sample_strat_q"](spark, sf)) + "```\n"
    )

    out.append("## IVF ANN probe (ivf_topk_q — build/query split)\n")
    out.append(
        "Check: the assignment-table scan carries `PartitionFilters` on "
        "`_cell` (only the n_probe probed cells are read — the r2 "
        "per-query-rebuild anti-pattern is gone: no kmeans jobs, no "
        "full-corpus assignment appear anywhere in this plan), the "
        "1-row query vector joins via `BroadcastNestedLoopJoin`/broadcast, "
        "and the top-k is `TakeOrderedAndProject`.\n"
    )
    out.append("```\n" + grab(entry.queries()["ivf_topk_q"](spark, sf)) + "```\n")

    out.append("## LSH ANN probe (lsh_probe_q — persisted sig table)\n")
    out.append(
        "Check: `PartitionFilters` on the sig-prefix column `_p` (only "
        "partitions holding Hamming-ball prefixes are read), the probe "
        "signatures join via `BroadcastHashJoin` on `sig` — there is NO "
        "full-signature-table scan and no bit_count filter over all rows "
        "(the r2 anti-pattern).\n"
    )
    out.append("```\n" + grab(entry.queries()["lsh_probe_q"](spark, sf)) + "```\n")

    out.append("## Dedup-index probe (dedup_index_q)\n")
    out.append(
        "Check: the persisted band table is scanned from parquet (no "
        "recomputation of the indexed corpus' shingles/bands — the only "
        "md5/shingle work in the plan belongs to the delta side), the "
        "candidate join is an equi-join on (band, minhash), and the "
        "verify joins are restricted to candidate ids (left_semi prune "
        "before the shingle-hash join).\n"
    )
    out.append("```\n" + grab(entry.queries()["dedup_index_q"](spark, sf)) + "```\n")

    out.append("## AND_NOT membership-only negative (ft_match_not path)\n")
    out.append(
        "Check: the negative term's subtree is a bare block scan → "
        "`MapInPandas` (doc-delta-only decode) → explode feeding the "
        "`BroadcastHashJoin ... LeftAnti` — NO aggregate (`HashAggregate`) "
        "and no score expression on that side; only the positive subtree "
        "carries the BM25 contrib + groupBy.\n"
    )
    out.append(
        "```\n"
        + grab(se.select("merge -sort", k=10, escalate=False))
        + "```\n"
    )

    out.append("## Token-budget quota fill (sample_budget_q)\n")
    out.append(
        "Check: the running-total window's input is the verified "
        "oversample pool (broadcast threshold join + `_h < _thr` filter "
        "upstream of the `Window`), unioned with the (normally empty) "
        "fallback branch — a heavy group's full membership never reaches "
        "the window sort.\n"
    )
    out.append(
        "```\n" + grab(entry.queries()["sample_budget_q"](spark, sf)) + "```\n"
    )

    with open(os.path.join(os.path.dirname(__file__), "..", "EXPLAIN.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote EXPLAIN.md")


if __name__ == "__main__":
    main()
