"""Top-k BM25 query engine over the inverted index.

Spark re-expression of ``grn_ii_select`` (reference lib/ii.c:6319-6569):

1. GET-mode tokenize the query (token_info_build, ii.c:5539-5637);
2. look the tokens up in the dictionary — the tiny query-term frame is
   **broadcast** against the postings frame, and the postings scan is
   filtered on (pbucket, term) so partition pruning + predicate pushdown
   reach the index files;
3. order AND-children by ascending df (token_compare, ii.c:5532-5537 —
   rarest-first intersection; Catalyst can't know document frequencies, so
   the planner fixes the join order);
4. block pruning BEFORE decode, JVM-side, on block metadata: doc-range skip
   (grn_ii_cursor_set_min / chunk_info.dgap, ii.c:4144-4172) for AND, and a
   two-phase block-max top-k bound (Block-Max WAND, Ding & Suel) for
   single-term queries;
5. positional phrase verification entirely JVM-side via array_intersect on
   offset-shifted position arrays (token_info_skip_pos, ii.c:5515-5530,
   phrase loop ii.c:6499-6527);
6. result-set algebra per grn_table_setoperation (lib/db.c:3896-4007):
   OR = full-outer join + score sum, AND = inner join + score sum,
   AND_NOT = left-anti;
7. top-k = orderBy(score desc, doc_id asc).limit(k) — Spark's
   TakeOrderedAndProject is Groonga's partial sort (db.c:10184-10240);
   the (score desc, doc_id asc) tie-break pins rank identity;
8. zero hits optionally escalate to looser matching (match escalation,
   ii.c:6659-6721).

Scoring is pinned BM25 (see scoring.py).  Pinned semantics for composite
atoms: a phrase/NEAR atom FILTERS on the positional condition but SCORES as
the sum of its unique tokens' BM25 contributions (documented deviation from
Groonga's noccur-based default scorer; Groonga itself treats the scorer as
pluggable, lib/scorers.c).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, IntegerType

from .. import scoring
from ..hashutil import term_pbucket
from ..index.build import InvertedIndex
from ..tokenize import tokenize_batch
from . import parser as qp
from .decode import decoded_postings

MAX_EXPANSIONS = 1024  # prefix-expansion cap


@dataclass
class _Atom:
    tokens: list[str]
    offsets: list[int]
    kind: str = "term"  # term | phrase | near | prefix
    expansions: list[str] | None = None
    max_interval: int = 10
    est_df: int = 0


MAX_BROADCAST_DOCS = 500_000  # (doc_id, score) rows ≈ 16 B each → ≤ 8 MB
# phrase/NEAR positional decode goes two-phase (tf-only scoring decode +
# a positions decode restricted to candidate blocks) once the positional
# tokens' summed df crosses this; below it the candidate shuffles cost
# more than just decoding the position arrays (measured: 3-token phrase
# of head terms at 1M docs: 27.5 s single-phase → ~5 s two-phase; at
# ≤100k docs single-phase wins by the fixed ~1.5 s of extra stages)
POS_TWO_PHASE_CUTOFF = 200_000
# anchor-driven block prune (the distributed analogue of the reference's
# rid-bound cursor skip, grn_ii_cursor_set_min ii.c:4144-4172, applied
# across terms): when every matching doc provably contains some rare
# "anchor" term, the other terms' posting BLOCKS are pruned to the doc-id
# grid cells the anchor's docs occupy before any decode.  Gates: the
# non-anchor postings must be big enough to beat the two extra metadata
# stages, and the anchor must be selective enough to prune anything.
#
# DEMOTED (r4, measured): after the r3 positional-path improvements
# (two-phase decode, candidate masking, rarest-first broadcast reduction)
# the prune lost its own A/Bs at its default firing condition —
# anchor_ab_4m_pos.json 0.71–1.04×, and the r4 planted sweep
# (prune_crossover_4m.json pos_anchor rows: anchor df 4k vs non-anchor
# df 4M, the prune's best case) 0.56×/0.64× on phrase/NEAR.  The
# rarest-token broadcast semi-filter in the two-phase path already
# delivers the rid-skip effect with zero extra stages, so the block-level
# variant pays nothing on top.  Sentinel-off; code + rank-identity tests
# (tests/test_anchor_prune.py) retained.
ANCHOR_PRUNE_CUTOFF = 10**15  # effectively off — measured: never pays
ANCHOR_PRUNE_RATIO = 4  # anchor df ≤ rest/RATIO, else nothing to prune
ANCHOR_PRUNE_GRID = 64  # min doc ids per grid cell (widens with n_docs)
# anchor must occupy ≤ 1/COVERAGE of the grid cells, else blocks survive
# the semi-join anyway and the prune is pure overhead (measured: a df=20k
# anchor over 1M docs touches ~100% of 1024-wide cells and the "prune"
# made the query 2.8x slower; see BASELINE.md anchor A/B)
ANCHOR_PRUNE_COVERAGE = 4
# only positional plans (phrase/NEAR) benefit: they push the non-anchor
# postings through the (doc, sid) candidate-join shuffles, which the prune
# shrinks by orders of magnitude.  Flat AND/OR decode is vectorized numpy
# (~10M postings/s/core) — measured at 1M AND 4M docs, pruning it never
# recovered the two extra stage barriers (0.5-0.85x), while NEAR at 4M
# docs won 2.4x.  See BASELINE.md anchor A/B.
ANCHOR_PRUNE_POS_ONLY = True
# phase-2 positional decode: mask rows to candidate doc ids INSIDE the
# decode UDF (ship per-block candidate arrays in, emit only candidates'
# positions) instead of decoding every posting of every candidate block
# and dropping non-candidates JVM-side after the Arrow transfer
POS_CAND_MASK = True
# block-max WAND for disjunctive (pure-OR) top-k: phase 1 decodes each
# term's covering blocks to fix θ (a true lower bound on the k-th score),
# then blocks are pruned two ways before the full decode — the classic
# WAND bound (block's own max + every other term's global max < θ) and a
# BMW-style per-doc-grid-cell upper bound Σ_t max_t(cell).
#
# DEMOTED (r4, measured): the r3 theory was a break-even at ~50M summed
# df; the r4 planted-term crossover sweep (prune_crossover_{4m,8m}.json —
# exact-df terms give controlled decode volumes of 0.4M/2M/4M/8M/12M
# estimated decoded postings, plus the natural-term wand_ab_{1m,4m}.json)
# measured forced-on/off speedups of 0.40–0.64 at EVERY point, with the
# on/off gap GROWING in volume, not shrinking: the θ-survivor decode
# scales with the same df as the flat decode (dl-driven score spread
# keeps most block maxima above θ), so the on arm inherits the off arm's
# slope PLUS ~3–4 s of fixed θ/metadata stages.  On a 32-core vectorized
# decode (~0.3 s marginal per 4M postings) there is NO crossover; the
# path would pay only where decode is orders of magnitude costlier per
# posting (e.g. row-at-a-time Python — exactly what this engine avoids).
# The cutoffs are therefore sentinel-off; the implementation, its rank-
# identity tests (tests/test_wand_or.py) and the forced-on oracle entry
# ft_wand_or remain as the reference-parity analogue of grn's chunk
# skipping (grn_ii_cursor_set_min, ii.c:4144-4172), which pays there
# because grn decodes chunks sequentially on one core.
WAND_OR_CUTOFF = 10**15  # effectively off — measured: never pays here

# AND_NOT right side: a pure-negative simple term skips the scored decode
# (no tf/dl decode, no contrib, no groupBy exchange) and anti-joins bare
# decoded doc ids instead — membership is all grn_ii_resolve_sel_and
# (ii.c:6740) keeps from that side anyway.  Gate for A/B only.
NEG_DOCS_ONLY = True

# select_batch: with this many or more fused tree queries, eagerly
# localCheckpoint the shared decode frames before building the per-query
# branches — every branch otherwise embeds the full decode lineage, and at
# Q branches the union's logical plan is Q× the decode subtree (a 32-tree
# batch OOM'd an 8g driver just RENDERING its plan string).  On a real
# cluster prefer a reliable checkpoint dir (localCheckpoint doesn't survive
# executor loss); locally the eager materialization is the shared decode
# job we want to run once anyway.
BATCH_TREE_CKPT_MIN = 4
# the cell refinement broadcasts the kept (term, block) pairs — bounded by
# the terms' block-metadata row count (Σ df / postings-per-block); skip the
# refinement (level-1 bound still applies) beyond this many metadata rows
WAND_CELL_MAX_META = 2_000_000


# DEMOTED (r4, measured) — same sweep as WAND_OR_CUTOFF above
# (prune_crossover_{4m,8m}.json, single_* rows): forced-on/off speedup
# 0.47/0.65/0.66/0.67 at 0.4M/2M/4M/8M decoded postings.  Both arms grow
# linearly with df (the θ-survivor set keeps most blocks: per-block dl
# minima put block maxima above θ), so the extra covering-decode + θ
# collect jobs are never repaid; the flat one-job decode wins at every
# measured volume and the gap widens.  Sentinel-off; implementation and
# tests retained (tests/test_single_term_topk.py) as the grn chunk-skip
# parity path.
SINGLE_TERM_PRUNE_CUTOFF = 10**15  # effectively off — measured: never pays


def _theta_slack(theta: float) -> float:
    """Loosen a top-k pruning threshold by a hair before comparing it to
    block max_score bounds: θ comes from SPARK-evaluated BM25 expressions
    while max_score was computed by numpy at build time — same formula,
    different libm/evaluation order, so the 'bound ≥ score' invariant can
    miss by an ulp and silently drop the very block that produced θ
    (caught by test_wand_or: 'merge OR qzqzqz' k=1 returned 0 rows).
    θ is a lower bound anyway; shaving 1e-9 relative only weakens the
    prune, never the guarantee."""
    return theta - max(abs(theta) * 1e-9, 1e-12)


def _anchor_grid(n_docs: int) -> int:
    """Grid cell width: fine enough that one anchor doc keeps ~one block
    of a dense term (block spans shrink as df grows), coarse enough that
    the metadata explode stays ≤ ~n_docs/GRID + n_blocks rows (the >> 26
    term caps it at ~64M cells however big the corpus)."""
    return max(ANCHOR_PRUNE_GRID, n_docs >> 26)


class SearchEngine:
    def __init__(self, index: InvertedIndex):
        self.index = index
        self.docs: DataFrame | None = None
        self.id_col: str = "doc_id"
        # set by select_with_count: the FULL scored (doc_id, score) frame of
        # the last query (persisted) and its exact hit count — callers that
        # need to post-filter the complete match set (select --query +
        # --filter) read last_scored instead of re-running the match
        self.last_scored: DataFrame | None = None
        self.last_n_hits: int = 0
        self._persisted: list[DataFrame] = []
        # columns forced onto the scan path even when indexed — models a
        # Groonga table whose column has NO index column (the engine here
        # may index a column merely to have a dictionary; conformance
        # scripts distinguish scan vs index semantics per column)
        self.scan_columns: set[str] = set()

    def _clear_cache(self) -> None:
        """Release the previous query's persisted frames (called once at
        the start of each select)."""
        for old in self._persisted:
            try:
                old.unpersist()
            except Exception:
                pass
        self._persisted = []

    def _persist(self, df: DataFrame) -> DataFrame:
        """Persist a scored frame for the duration of one query (count +
        top-k + caller page read share one evaluation); released by the
        next query's :meth:`_clear_cache`."""
        df = df.persist()
        self._persisted.append(df)
        return df

    @classmethod
    def build(cls, df: DataFrame, text_cols: list[str], tokenizer: str = "bigram", **kw):
        from ..index.build import build_index

        eng = cls(build_index(df, text_cols, tokenizer=tokenizer, **kw))
        # column-operator atoms (column:<v, column:@sub, ...) on unindexed
        # columns evaluate as scans over the source frame; engines loaded
        # from a checkpoint can attach one via `eng.docs = df`
        eng.docs = df
        eng.id_col = kw.get("id_col", "doc_id")
        return eng

    # -- query tokenization (GET mode) ------------------------------------
    def _get_tokens(self, text: str) -> tuple[list[str], list[int]]:
        terms, poss = tokenize_batch([text], self.index.tokenizer)[0]
        if "stem" in self.index.token_filters:
            from ..stem import stem_terms

            terms = stem_terms(terms)
        if "stopword" in self.index.token_filters and self.index.stopwords:
            # TokenFilterStopWord is GET-only (stop_word.c:143): stop words
            # stay indexed; query tokens flagged is_stop_word are skipped,
            # surviving tokens keep their original query offsets
            kept = [
                (t, p) for t, p in zip(terms, poss) if t not in self.index.stopwords
            ]
            terms = [t for t, _ in kept]
            poss = [p for _, p in kept]
        if self.index.tokenizer == "code":
            # GET mode: ADD emits full-identifier extras at duplicate
            # positions (tokenize.py _emit_code).  Skip them — Groonga's GET
            # cursor skips overlapping tokens (token_cursor.c:241-251) —
            # EXCEPT when the whole query is a single multi-segment
            # identifier: then the full token is the exact, rarer key
            # (UNSPLIT preference, ii.c:5555-5559).
            by_pos: dict[int, list[str]] = {}
            for t, p in zip(terms, poss):
                by_pos.setdefault(p, []).append(t)
            seg_pos = sorted(by_pos)
            seg_terms = [by_pos[p][0] for p in seg_pos]
            fulls = [v[1] for v in by_pos.values() if len(v) > 1]
            if len(fulls) == 1 and fulls[0].replace("_", "") == "".join(seg_terms):
                return [fulls[0]], [0]
            return seg_terms, seg_pos
        return terms, poss

    def _gram_n(self) -> int | None:
        """n-gram size of the index tokenizer (None for whole-token
        tokenizers like delimit/code)."""
        from ..tokenize import _NGRAM_VARIANTS

        tok = self.index.tokenizer
        if tok == "regexp":
            return 2
        v = _NGRAM_VARIANTS.get(tok)
        return v[0] if v is not None and v[0] > 1 else None

    def _adjust_ngram_tail(
        self, terms: list[str], offs: list[int]
    ) -> tuple[list[str], list[int], bool]:
        """GET-mode trailing-gram correction for n-gram tokenizers
        (ADVICE r1 / reference GET cursor semantics): the query's final
        shortened gram (< n chars) is only ever indexed at run ENDS, so a
        mid-run document occurrence never has it — phrase-matching it
        yields false negatives.  With >= 2 tokens the tail is REDUNDANT
        (its chars are the previous gram's suffix) → drop it, exactness
        preserved.  A lone short token instead becomes prefix-matchable
        (returns as_prefix=True), mirroring the reference's treatment of
        the final short gram."""
        n = self._gram_n()
        if n is None or not terms or len(terms[-1]) >= n:
            return terms, offs, False
        if not self._is_split_gram(terms[-1]):
            # a short COMPLETE run token (uni_alpha/digit/symbol class the
            # tokenizer keeps whole, e.g. 'm' under plain TokenBigram) is
            # an exact dictionary term, not a truncated gram — leave it
            return terms, offs, False
        if len(terms) > 1:
            return terms[:-1], offs[:-1], False
        return terms, offs, True

    def _is_split_gram(self, tok: str) -> bool:
        """True when the tokenizer n-gram-splits this token's char class —
        only then is a short trailing token an unmatured gram (the GET
        cursor's force-prefix flag, tokenizers.c ngram state).  CJK
        (non-ASCII) always splits; ASCII classes split per the variant's
        uni_* flags."""
        from ..normalize import ALPHA, CLS_LUT, DIGIT, NONASCII, SYMBOL
        from ..tokenize import _NGRAM_VARIANTS

        variant = _NGRAM_VARIANTS.get(
            "bigram_split_symbol_alpha_digit"
            if self.index.tokenizer == "regexp"
            else self.index.tokenizer
        )
        if variant is None:
            return True  # unknown n-gram mode: keep the conservative r1 path
        split_names = variant[1]
        ch = tok[0]
        cls = NONASCII if ord(ch) > 0x7F else int(CLS_LUT[ord(ch)])
        name = {ALPHA: "alpha", DIGIT: "digit", SYMBOL: "symbol"}.get(cls)
        return cls == NONASCII or name in split_names

    # -- atom construction --------------------------------------------------
    def _compile_atoms(self, node, atoms: list[_Atom]):
        """Compile the AST to atoms; a clause whose tokens are ALL filtered
        away (stop words / empty) compiles to None and drops out of its
        parent — Groonga's GET cursor simply skips stopped tokens
        (stop_word.c:143)."""
        if isinstance(node, qp.Term):
            terms, offs = self._get_tokens(node.text)
            if not terms:
                return None
            if node.prefix:
                if len(terms) != 1:
                    raise qp.QueryParseError("prefix query must be single-token")
                a = _Atom(tokens=terms, offsets=offs, kind="prefix")
            else:
                terms, offs, as_prefix = self._adjust_ngram_tail(terms, offs)
                if as_prefix:
                    a = _Atom(tokens=terms, offsets=offs, kind="prefix")
                elif len(terms) == 1:
                    a = _Atom(tokens=terms, offsets=offs, kind="term")
                else:
                    a = _Atom(tokens=terms, offsets=offs, kind="phrase")
            atoms.append(a)
            return a
        if isinstance(node, qp.Phrase):
            terms, offs = self._get_tokens(node.text)
            if not terms:
                return None
            terms, offs, as_prefix = self._adjust_ngram_tail(terms, offs)
            if as_prefix:
                a = _Atom(tokens=terms, offsets=offs, kind="prefix")
            else:
                a = _Atom(
                    tokens=terms, offsets=offs, kind="phrase" if len(terms) > 1 else "term"
                )
            atoms.append(a)
            return a
        if isinstance(node, qp.Near):
            terms, offs = self._get_tokens(node.text)
            if not terms:
                return None
            if len(terms) > 1:  # drop the redundant short tail gram too
                terms, offs, _ = self._adjust_ngram_tail(terms, offs)
            if node.no_offset:
                offs = [0] * len(terms)  # NEAR2: raw positions (ii.c:5639)
            a = _Atom(tokens=terms, offsets=offs, kind="near", max_interval=node.max_interval)
            atoms.append(a)
            return a
        if isinstance(node, (qp.And, qp.Or)):
            children = [self._compile_atoms(c, atoms) for c in node.children]
            children = [c for c in children if c is not None]
            if not children:
                return None
            if len(children) == 1:
                return children[0]
            return type(node)(children)
        if isinstance(node, qp.Not):
            pos = self._compile_atoms(node.positive, atoms)
            neg = self._compile_atoms(node.negative, atoms)
            if pos is None:
                return None
            if neg is None:
                return pos
            return qp.Not(pos, neg)
        if isinstance(node, qp.ColumnOp):
            # evaluated standalone in _eval_colop — resolves its own terms
            # (indexed section match/prefix/suffix) or scans the source
            # frame (scalar comparisons, unindexed columns)
            return node
        if isinstance(node, (qp.AllRecords, qp.Nothing)):
            return node  # evaluated over the source frame in _eval
        raise TypeError(node)

    # -- main entry ----------------------------------------------------------
    def _resolve_weights(self, match_columns: str | None) -> dict[int, float]:
        idx = self.index
        if match_columns is None:
            return {sid: 1.0 for sid in idx.stats.sections}
        col_to_sid = {c: sid for sid, c in idx.stats.sections.items()}
        weights: dict[int, float] = {}
        for col, w in qp.parse_match_columns(match_columns):
            if col not in col_to_sid:
                raise ValueError(f"{col} is not an indexed section")
            # the same column listed twice (e.g. via TWO index columns over
            # one source — load/index/online/key_twice "Index1.users_key *
            # 10 || Index2.users_key * 5") runs one search per entry and
            # the result sets OR-merge: scores ADD
            sid = col_to_sid[col]
            weights[sid] = weights.get(sid, 0.0) + w
        return weights

    def select(
        self,
        query: str,
        match_columns: str | None = None,
        k: int = 10,
        escalate: bool = True,
        prune: bool = True,
        scorer: str = "bm25",
        adjuster: list[tuple[str, float]] | None = None,
        escalation_threshold: int = 0,
        query_expander: "dict[str, list[str]] | None" = None,
        query_flags: "str | None" = None,
    ) -> DataFrame:
        """Returns (doc_id, score) top-k, rank-identical ordering.

        ``scorer`` swaps the per-posting scoring expression (pluggable
        scorers, reference lib/scorer.c + lib/scorers.c): "bm25" (default),
        "tf_idf" (scorer_tf_idf, scorers.c:26-52: tf·log(N/df) floored at
        1.0 per term), or "tf_at_most:<cap>" (scorers.c:54-88: min(tf,cap)).
        Block-max pruning only applies to bm25 (its block bounds are BM25
        upper bounds).

        ``adjuster`` mirrors ``--adjuster 'col @ "term" * factor'``
        (GRN_OP_ADJUST res_add variant, ii.c:5677-5683): after the main
        match, score += factor·tf(term) for result docs containing term.

        ``escalation_threshold`` mirrors the reference's match-escalation
        hit threshold (grn_ii_sel, ii.c:6659-6721; default 0 per
        configure.ac:434): looser levels run while hits <= threshold.
        """
        out, _ = self.select_with_count(
            query,
            match_columns,
            k=k,
            escalate=escalate,
            prune=prune,
            scorer=scorer,
            adjuster=adjuster,
            escalation_threshold=escalation_threshold,
            count_hits=False,
            query_expander=query_expander,
            query_flags=query_flags,
        )
        return out

    def select_batch(
        self,
        queries: "dict[str, str]",
        k: int = 10,
        scorer: str = "bm25",
    ) -> DataFrame:
        """Answer a whole query SET in one pass: (query_id, doc_id, score)
        top-k per query, rank-identical per query to :meth:`select` with
        ``escalate=False``.

        The reference serves requests one at a time off a queue
        (lib/com.c); at cluster scale the equivalent workload is an
        offline query-set evaluation where per-query job overhead
        dominates — Q sequential selects cost Q × (decode + shuffle +
        top-k) jobs.  This path runs ONE shared tf decode over the union
        of every query's terms, joins the broadcast (query_id, term)
        map, and takes per-query top-k in a single window — ~3 stages
        for the whole set.

        Fused plans, two tiers sharing ONE decode:

        * **flat** — a bare term / AND of terms / OR of terms (each a
          single token): one broadcast (query_id, term) map join + one
          per-query window top-k for the whole tier.  AND duplicates a
          term's contribution per occurrence (matching _eval's
          inner-join sum) via a multiplicity column, and requires every
          distinct term present (count == n_req).
        * **tree** — any And/Or/Not tree whose leaves are term, prefix,
          phrase, or NEAR atoms or SCAN-path column operators: evaluated
          per query by the same :meth:`_eval` planner :meth:`select`
          uses, but against the SHARED term_doc / position frames (every
          atom filters by its own tokens, so sharing is exact).
          Phrase/NEAR tokens join the shared positional decode; prefix
          expansions resolve once per distinct prefix across the set;
          scan colops stay the single pruned docs.filter frame _eval
          plans anyway.

        Anything else — INDEXED-column match/prefix/suffix operators
        (their per-atom decode subtree would bloat the union plan past
        what the shared checkpoint truncates), ``*S``/``*T`` modes,
        pragma overrides — falls back to a per-query :meth:`select` and
        is unioned in, so the result is always complete."""
        idx = self.index
        spark = idx.dictionary.sparkSession
        self._clear_cache()  # release the previous query's persisted frames
        weights = self._resolve_weights(None)
        self._tfidf_mode = scorer == "tf_idf"
        if self._tfidf_mode:
            scorer = "tf"

        col_to_sid = {col: sid for sid, col in idx.stats.sections.items()}

        def _colop_scan_ok(c: "qp.ColumnOp") -> bool:
            # scan-path colops fuse (they're one docs.filter frame each —
            # _eval even collapses ANDed ones into a single pruned scan);
            # INDEXED match/prefix/suffix colops would spawn their own
            # per-atom decode subtree, which the shared checkpoint can't
            # truncate, so those still fall back
            if self.docs is None:
                return False
            sid = (
                None
                if c.column in self.scan_columns
                else col_to_sid.get(c.column)
            )
            return not (c.op in ("match", "prefix", "suffix") and sid is not None)

        def _tree_fusable(node) -> bool:
            if isinstance(node, _Atom):
                return node.kind in ("term", "prefix", "phrase", "near")
            if isinstance(node, qp.ColumnOp):
                return _colop_scan_ok(node)
            if isinstance(node, (qp.And, qp.Or)):
                return all(_tree_fusable(c) for c in node.children)
            if isinstance(node, qp.Not):
                return _tree_fusable(node.positive) and _tree_fusable(
                    node.negative
                )
            return False

        qmap_rows: list[tuple[str, str, int, int, bool]] = []
        fallback: list[str] = []
        fused: "dict[str, tuple]" = {}  # qid -> (plan, atoms)
        batch_tokens: set[str] = set()
        for qid, query in queries.items():
            try:
                ast, prag = qp.parse_query_ex(query)
            except Exception:
                fallback.append(qid)
                continue
            if (
                prag.mode is not None
                or prag.weights is not None
                or prag.escalation_threshold is not None
            ):
                fallback.append(qid)
                continue
            atoms: list[_Atom] = []
            plan = self._compile_atoms(ast, atoms)
            flat_children = None
            if (
                isinstance(plan, _Atom)
                and plan.kind == "term"
                and len(plan.tokens) == 1
            ):
                flat_children, is_and = [plan], True
            elif isinstance(plan, (qp.And, qp.Or)) and all(
                isinstance(c, _Atom) and c.kind == "term" and len(c.tokens) == 1
                for c in plan.children
            ):
                flat_children, is_and = list(plan.children), isinstance(plan, qp.And)
            if flat_children is not None and not self._tfidf_mode:
                # (tf_idf's record-level idf scale is applied per-atom by
                # _eval_atom — route those through the tree tier instead)
                toks = [c.tokens[0] for c in flat_children]
                n_req = len(set(toks))
                for t in set(toks):
                    qmap_rows.append((qid, t, toks.count(t), n_req, is_and))
                batch_tokens.update(toks)
            elif _tree_fusable(plan):
                fused[qid] = (plan, atoms)
                batch_tokens.update(
                    t for a in atoms if a.kind != "prefix" for t in a.tokens
                )
            else:
                fallback.append(qid)

        parts: list[DataFrame] = []
        # fallbacks FIRST: each select() clears the engine's persisted-frame
        # cache, which would unpersist the shared decode built below
        for qid in fallback:
            one = self.select(queries[qid], k=k, escalate=False, scorer=scorer)
            parts.append(
                one.select(F.lit(qid).alias("query_id"), "doc_id", "score")
            )

        if qmap_rows or fused:
            # prefix expansions resolve ONCE per distinct prefix across the
            # whole set (each is a tiny ordered dictionary-range collect)
            term_meta: dict[str, int] = {}
            pfx_cache: "dict[str, list]" = {}
            for _qid, (_plan, atoms) in fused.items():
                for a in atoms:
                    if a.kind != "prefix":
                        continue
                    pfx = a.tokens[0]
                    if pfx not in pfx_cache:
                        pfx_cache[pfx] = (
                            idx.dictionary.filter(F.col("term").startswith(pfx))
                            .select("term", "df")
                            .orderBy(F.desc("df"))
                            .limit(MAX_EXPANSIONS)
                            .collect()
                        )
                    rows = pfx_cache[pfx]
                    a.expansions = [r["term"] for r in rows]
                    term_meta.update({r["term"]: int(r["df"]) for r in rows})
                    a.est_df = sum(int(r["df"]) for r in rows)
                    batch_tokens.update(a.expansions)
            exact = sorted(t for t in batch_tokens if t not in term_meta)
            if exact:
                rows = (
                    idx.dictionary.filter(F.col("term").isin(exact))
                    .select("term", "df")
                    .collect()
                )
                term_meta.update({r["term"]: int(r["df"]) for r in rows})
            pos_groups = [
                a.tokens
                for _qid, (_plan, atoms) in fused.items()
                for a in atoms
                if a.kind in ("phrase", "near")
            ]
            for _qid, (_plan, atoms) in fused.items():
                for a in atoms:
                    if a.kind != "prefix":
                        a.est_df = min(
                            (term_meta.get(t, 0) for t in a.tokens), default=0
                        )
            pos_tokens = sorted(
                {t for g in pos_groups for t in g if term_meta.get(t, 0) > 0}
            )
            flat_tokens = sorted(
                t
                for t in batch_tokens
                if term_meta.get(t, 0) > 0 and t not in pos_tokens
            )
            self._cur_weights, self._cur_scorer = weights, scorer
            td_parts: list[DataFrame] = []
            pos_rows = None
            if pos_tokens:
                td_p, pos_rows = self._scored_term_doc(
                    pos_tokens,
                    term_meta,
                    weights,
                    need_pos=True,
                    scorer=scorer,
                    pos_groups=pos_groups,
                )
                td_parts.append(td_p)
            if flat_tokens:
                td_f, _ = self._scored_term_doc(
                    flat_tokens, term_meta, weights, need_pos=False, scorer=scorer
                )
                td_parts.append(td_f)
            if pos_rows is None and pos_groups:
                # every positional token is dead — phrase/NEAR branches
                # still evaluate (to no hits) against an empty frame
                pos_rows = spark.createDataFrame(
                    [], "term string, doc_id long, sid int, positions array<int>"
                )
            if td_parts:
                term_doc = td_parts[0]
                for p in td_parts[1:]:
                    term_doc = term_doc.unionByName(p)
            else:
                term_doc = spark.createDataFrame(
                    [], "term string, doc_id long, score double"
                )
            if len(fused) >= BATCH_TREE_CKPT_MIN:
                # truncate lineage so each tree branch scans a compact
                # materialized RDD instead of re-embedding the decode plan
                term_doc = term_doc.localCheckpoint()
                if pos_rows is not None:
                    pos_rows = pos_rows.localCheckpoint()
            if qmap_rows:
                qmap = spark.createDataFrame(
                    qmap_rows,
                    "query_id string, term string, _mult int, _nreq int, _is_and boolean",
                )
                per_q = (
                    term_doc.join(F.broadcast(qmap), "term")
                    .groupBy("query_id", "doc_id")
                    .agg(
                        F.sum(F.col("score") * F.col("_mult")).alias("score"),
                        F.count("*").alias("_nt"),
                        F.first("_nreq").alias("_nreq"),
                        F.first("_is_and").alias("_is_and"),
                    )
                    .filter(~F.col("_is_and") | (F.col("_nt") == F.col("_nreq")))
                )
                from pyspark.sql import Window as _W

                rw = _W.partitionBy("query_id").orderBy(
                    F.desc("score"), F.asc("doc_id")
                )
                parts.append(
                    per_q.withColumn("_rn", F.row_number().over(rw))
                    .filter(F.col("_rn") <= k)
                    .select("query_id", "doc_id", "score")
                )
            # the shared decode above already scored every fused token —
            # including AND_NOT right sides — so the membership-only
            # re-decode would be a second read of the same postings, not a
            # saving.  Reset explicitly so _eval never fires the fast path
            # off stale select() state (e.g. this batch's own fallback
            # selects), which would also silently inherit select()'s
            # section-weight gate if batch weights ever become
            # configurable.
            self._neg_only_terms = set()
            for qid, (plan, _atoms) in fused.items():
                sc = self._eval(plan, term_doc, pos_rows, term_meta)
                parts.append(
                    sc.orderBy(F.desc("score"), F.asc("doc_id"))
                    .limit(k)
                    .select(F.lit(qid).alias("query_id"), "doc_id", "score")
                )
        if not parts:
            return spark.createDataFrame(
                [], "query_id string, doc_id long, score double"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def select_with_count(
        self,
        query: str,
        match_columns: str | None = None,
        k: int = 10,
        escalate: bool = True,
        prune: bool = True,
        scorer: str = "bm25",
        adjuster: list[tuple[str, float]] | None = None,
        escalation_threshold: int = 0,
        need_full: bool = False,
        count_hits: bool = True,
        query_expander: "dict[str, list[str]] | None" = None,
        query_flags: "str | None" = None,
    ) -> tuple[DataFrame, int]:
        """Like :meth:`select` but also returns the exact TOTAL hit count
        (the reference select's first output element) from the SAME
        evaluation — the scored frame is persisted, counted once, and the
        top-k is taken from the cache, so the query runs exactly one time
        (r1 ran it up to 3×: escalation probe + n_hits recount + page).

        ``need_full=True`` additionally guarantees ``self.last_scored`` is
        the complete scored match set (disables block-max pruning, whose
        output is only the top-k candidate superset).

        ``count_hits=False`` (the plain :meth:`select` path) skips the
        count job when nothing needs it — escalation still forces a count
        because the threshold decision is exact; the returned count is -1
        for "not computed"."""
        idx = self.index
        spark = idx.dictionary.sparkSession
        self._clear_cache()
        ast, prag = qp.parse_query_ex(query, flags=query_flags)
        if prag.escalation_threshold is not None:
            escalation_threshold = prag.escalation_threshold
        if prag.force_exact:
            # *X (expr.c:5526-5531): EXACT mode only — never escalate
            escalate = False

        # *S / *T mode pragmas route the whole query to similar-search /
        # term-extract-match (expr.c:5592-5639 → ii.c:5836-6048)
        if prag.mode is not None:
            if prag.mode == "similar":
                frame = self._similar_frame(
                    prag.text,
                    scorer=scorer,
                    threshold=prag.similarity_threshold,
                )
            else:
                frame = self._term_extract_frame(prag.text)
            frame = self._persist(frame)
            n_hits = frame.count()
            self.last_scored, self.last_n_hits = frame, n_hits
            out = (
                frame.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
                .select("doc_id", "score")
            )
            return out, n_hits

        if query_expander:
            # --query_expander (QueryExpanderTSV, plugins/query_expanders/
            # tsv.c): each matching source term rewrites to the OR of its
            # substitutions BEFORE tokenization/compilation
            ast = _expand_ast(ast, query_expander)
        atoms: list[_Atom] = []
        plan = self._compile_atoms(ast, atoms)
        if prag.weights is not None:
            # *W<sid>[:w] overrides match weights by section number
            bad = [s for s in prag.weights if s not in idx.stats.sections]
            if bad:
                raise ValueError(f"*W names unknown sections {bad}")
            weights = dict(prag.weights)
        else:
            weights = self._resolve_weights(match_columns)
        # phrase/NEAR scoring under the reference's tf scorer needs the
        # occurrence counts + section weights (see _eval_phrase)
        #
        # scorer_tf_idf (scorers.c:26-52) is RECORD-level: tf is the plain
        # occurrence count and one idf multiplies the whole atom —
        # idf = log(N / (n_candidates/n_tokens)) over the atom's token
        # infos, floored at 1 per record.  Evaluate under "tf" and let
        # _eval_atom / _prefix_expansion_frame apply the scale.
        self._tfidf_mode = scorer == "tf_idf"
        if self._tfidf_mode:
            scorer = "tf"
        self._cur_weights, self._cur_scorer = weights, scorer

        # resolve prefix expansions + per-term df on the driver (tiny)
        exact_terms = sorted({t for a in atoms for t in a.tokens if a.kind != "prefix"})
        term_meta: dict[str, int] = {}
        if exact_terms:
            rows = idx.dictionary.filter(F.col("term").isin(exact_terms)).select(
                "term", "df"
            ).collect()
            term_meta.update({r["term"]: int(r["df"]) for r in rows})
        for a in atoms:
            if a.kind == "prefix":
                pfx = a.tokens[0]
                rows = (
                    idx.dictionary.filter(F.col("term").startswith(pfx))
                    .select("term", "df")
                    .orderBy(F.desc("df"))
                    .limit(MAX_EXPANSIONS)
                    .collect()
                )
                a.expansions = [r["term"] for r in rows]
                term_meta.update({r["term"]: int(r["df"]) for r in rows})
                a.est_df = sum(int(r["df"]) for r in rows)
            else:
                a.est_df = min((term_meta.get(t, 0) for t in a.tokens), default=0)

        # Terms whose ONLY role is the right side of an AND_NOT need
        # membership, not scores: they skip the scored decode entirely
        # (doc-delta-only decode in _eval's Not fast path — no tf/dl
        # Python decode, no contrib expr, no groupBy exchange).  Terms
        # that also occur positively stay in the scored set.
        # The membership-only decode reads the negated term's postings
        # across ALL sections; the scored path it replaces restricts the
        # match to weighted sections (_contrib_col null-filters unmatched
        # sids — mirroring the reference, where match_columns scopes
        # negated terms too).  With restricted --match_columns / *W the
        # fast path would over-exclude docs whose negated term appears
        # only in an unmatched section, so it is sound only when every
        # section is weighted.
        _all_sections = set(weights) == set(idx.stats.sections)
        neg_atoms = (
            _neg_simple_atoms(plan) if (NEG_DOCS_ONLY and _all_sections) else []
        )
        neg_ids = {id(a) for a in neg_atoms}
        pos_terms = {
            t
            for a in atoms
            if id(a) not in neg_ids
            for t in (a.expansions if a.kind == "prefix" else a.tokens)
        }
        self._neg_only_terms = {
            a.tokens[0] for a in neg_atoms if a.tokens[0] not in pos_terms
        }
        all_terms = (
            sorted(pos_terms)
            if pos_terms
            else sorted(
                {
                    t
                    for a in atoms
                    for t in (a.expansions if a.kind == "prefix" else a.tokens)
                }
            )
        )
        if not pos_terms:
            self._neg_only_terms = set()
        empty = spark.createDataFrame([], "doc_id long, score double")
        has_colop = _has_colop(plan)
        if (not all_terms or all(term_meta.get(t, 0) == 0 for t in all_terms)) and (
            not has_colop
        ):
            self.last_scored, self.last_n_hits = empty, 0
            if escalate:
                return self._escalated(
                    _strip_pragmas(query),
                    match_columns,
                    k,
                    scorer,
                    escalation_threshold,
                )
            return empty, 0

        need_pos = any(a.kind in ("phrase", "near") for a in atoms)

        # single simple-term query → block-max two-phase pruning.
        # Only sound when exactly ONE section is matched: then each doc has
        # at most one posting for the term, so a block's max_score (scaled
        # by the section weight) upper-bounds every doc score inside it.
        # With multiple sections a doc's score sums across blocks and
        # per-block bounds no longer bound the total.  The exact hit count
        # comes from the dictionary: a single-section index has one posting
        # per matching doc, so n_hits == df — no extra job.
        if (
            prune
            and not need_full
            and (not escalate or escalation_threshold == 0)
            and scorer == "bm25"
            and adjuster is None
            and isinstance(plan, _Atom)
            and plan.kind == "term"
            and not need_pos
            and len(weights) == 1
            and len(idx.stats.sections) == 1
        ):
            result = self._persist(
                self._single_term_topk(plan.tokens[0], term_meta, weights, k)
            )
            n_hits = term_meta.get(plan.tokens[0], 0)
        elif (
            prune
            and not need_full
            and not count_hits
            and (not escalate or escalation_threshold == 0)
            and scorer == "bm25"
            and adjuster is None
            and isinstance(plan, qp.Or)
            and all(
                isinstance(c, _Atom) and c.kind == "term" and len(c.tokens) == 1
                for c in plan.children
            )
            and len({c.tokens[0] for c in plan.children}) == len(plan.children)
            and not need_pos
            and len(weights) == 1
            and next(iter(weights.values())) > 0
            and len(idx.stats.sections) == 1
            and sum(term_meta.get(t, 0) for t in all_terms) > WAND_OR_CUTOFF
        ):
            # disjunctive top-k → block-max WAND (the north-star pruning;
            # sound here for the same single-section reason as above, and
            # only when every matching doc of a union branch scores once —
            # duplicate branch tokens would double-count in _eval's
            # full_outer score-sum, so those fall through).  Escalation is
            # moot: some term has df ≥ 1, so hits ≥ 1 > threshold 0.
            result = self._persist(
                self._wand_or_topk(
                    [c.tokens[0] for c in plan.children], term_meta, weights, k
                )
            )
            n_hits = -1  # pruned frame is a candidate superset — never count it
        else:
            anchor = None
            if (
                prune
                and len(all_terms) > 1
                and (need_pos or not ANCHOR_PRUNE_POS_ONLY)
            ):
                req = _required_tokens(plan) & set(all_terms)
                if req:
                    cand = min(req, key=lambda t: (term_meta.get(t, 0), t))
                    a_df = term_meta.get(cand, 0)
                    rest = sum(
                        term_meta.get(t, 0) for t in all_terms if t != cand
                    )
                    n_cells = max(
                        1, idx.stats.n_docs // _anchor_grid(idx.stats.n_docs)
                    )
                    if (
                        rest > ANCHOR_PRUNE_CUTOFF
                        and a_df * ANCHOR_PRUNE_RATIO <= rest
                        and a_df <= MAX_BROADCAST_DOCS
                        and a_df * ANCHOR_PRUNE_COVERAGE <= n_cells
                    ):
                        anchor = cand
            term_doc, pos_rows = self._scored_term_doc(
                all_terms, term_meta, weights, need_pos, scorer,
                pos_groups=[
                    a.tokens for a in atoms if a.kind in ("phrase", "near")
                ],
                anchor=anchor,
                pos_only=(
                    isinstance(plan, _Atom)
                    and plan.kind in ("phrase", "near")
                ),
            )
            result = self._eval(plan, term_doc, pos_rows, term_meta)
            if adjuster:
                result = self._apply_adjuster(result, adjuster)
            if count_hits or escalate or need_full:
                result = self._persist(result)
            if count_hits or escalate:
                n_hits = result.count()
            else:
                n_hits = -1  # not computed — nothing downstream needs it

        self.last_scored, self.last_n_hits = result, n_hits
        out = (
            result.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "score")
        )
        if escalate and 0 <= n_hits <= escalation_threshold:
            return self._escalated(
                _strip_pragmas(query),
                match_columns,
                k,
                scorer,
                escalation_threshold,
                base=result,
                base_n=n_hits,
            )
        return out, n_hits

    def _apply_adjuster(self, result: DataFrame, adjuster) -> DataFrame:
        """GRN_OP_ADJUST (ii.c:5677-5683): score += factor·tf for result
        docs that contain the adjuster term.  Left join so non-matching
        docs keep their score."""
        for term, factor in adjuster:
            blocks = self._filtered_blocks([term], {})
            rows = decoded_postings(blocks, with_pos=False)
            adj = rows.groupBy("doc_id").agg(
                (F.lit(float(factor)) * F.sum("tf")).alias("_adj")
            )
            result = (
                result.join(adj, "doc_id", "left")
                .withColumn(
                    "score", F.col("score") + F.coalesce(F.col("_adj"), F.lit(0.0))
                )
                .drop("_adj")
            )
        return result

    # -- suffix / regexp / similar / term-extract (grn_ii_* API parity) -----
    def suffix_search(self, suffix: str, k: int = 10) -> DataFrame:
        """SUFFIX search (grn_table_search GRN_OP_SUFFIX → PAT+SIS,
        pat.c:1023; query syntax ``column:$x``): expand the suffix over the
        dictionary via the reversed-term column (prefix predicate on rterm —
        a range scan, not a full dict scan), then OR the expansions' postings
        with BM25-summed scores."""
        weights = {sid: 1.0 for sid in self.index.stats.sections}
        return (
            self._suffix_frame(suffix, weights)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "score")
        )

    def regexp_search(
        self, docs: DataFrame, text_col: str, pattern: str, id_col: str = "doc_id"
    ) -> DataFrame:
        """REGEXP match (``column:~re``) — the sequential-scan path.  Groonga
        index-accelerates regexp only through a TokenRegexp-tokenized lexicon
        (grn_ii_select_regexp, ii.c:6049-6117); with any other tokenizer it
        falls back to an Onigmo scan (expr.c:4673 + operator.c:922), which is
        what ``rlike`` over the corpus expresses — a parallel,
        predicate-pushdown-friendly full scan.  A term-dictionary prefilter
        would be unsound here: a literal can match inside a longer token.
        Score pinned to 1.0 per matching doc (the scan path's behavior)."""
        return docs.filter(F.col(text_col).rlike(pattern)).select(
            F.col(id_col).alias("doc_id"), F.lit(1.0).alias("score")
        )

    def regexp_index_search(
        self, docs: DataFrame, text_col: str, pattern: str, id_col: str = "doc_id"
    ) -> DataFrame:
        """Index-accelerated REGEXP over a TokenRegexp index
        (grn_ii_select_regexp, ii.c:6049-6117): extract a required literal
        from the pattern, phrase-match its char bigrams (plus begin/end
        sentinel tokens for ``\\A``/``\\z``) through the index as a
        PREFILTER, then rlike-verify only the candidate docs.  The index
        must be built with ``tokenizer="regexp"``.  Sound: the prefilter is
        a superset of true matches (literal restricted to a single
        char-class run so its bigrams are guaranteed consecutive in any
        occurrence); falls back to the scan path when the pattern has no
        usable literal."""
        import re as _re

        from ..tokenize import REGEXP_BEGIN, REGEXP_END

        if self.index.tokenizer != "regexp":
            raise ValueError("regexp_index_search needs a tokenizer='regexp' index")
        body = pattern
        anchored_begin = body.startswith("\\A") or body.startswith("^")
        anchored_end = body.endswith("\\z") or (
            body.endswith("$") and not body.endswith("\\$")
        )
        core = _re.sub(r"^(\\A|\^)", "", _re.sub(r"(\\z|(?<!\\)\$)$", "", body))

        req = _required_literal(core)
        if req is None:
            return self.regexp_search(docs, text_col, pattern, id_col)
        best, best_span = req

        lit = best.lower()
        tokens = [lit[i : i + 2] for i in range(len(lit) - 1)]
        offs = list(range(len(tokens)))
        # sentinel anchors apply only when the literal adjoins the anchor
        if anchored_begin and best_span[0] == 0:
            tokens = [REGEXP_BEGIN, *tokens]
            offs = [0, *[o + 1 for o in offs]]
        if anchored_end and best_span[1] == len(core):
            # after the literal's last bigram comes the trailing unigram,
            # then the end sentinel
            tokens = [*tokens, lit[-1], REGEXP_END]
            offs = [*offs, offs[-1] + 1, offs[-1] + 2]

        term_meta: dict[str, int] = {}
        rows = (
            self.index.dictionary.filter(F.col("term").isin(sorted(set(tokens))))
            .select("term", "df")
            .collect()
        )
        term_meta.update({r["term"]: int(r["df"]) for r in rows})
        if any(term_meta.get(t, 0) == 0 for t in tokens):
            return docs.sparkSession.createDataFrame([], "doc_id long, score double")

        a = _Atom(tokens=tokens, offsets=offs, kind="phrase" if len(tokens) > 1 else "term")
        weights = {sid: 1.0 for sid in self.index.stats.sections}
        term_doc, pos_rows = self._scored_term_doc(
            sorted(set(tokens)), term_meta, weights, need_pos=len(tokens) > 1,
            pos_groups=[tokens], pos_only=len(tokens) > 1,
        )
        cand = self._eval_atom(a, term_doc, pos_rows).select("doc_id")
        return (
            docs.join(cand, docs[id_col] == cand["doc_id"], "left_semi")
            .filter(F.col(text_col).rlike(pattern))
            .select(F.col(id_col).alias("doc_id"), F.lit(1.0).alias("score"))
        )

    def similar_search(
        self, text: str, k: int = 10, max_terms: int | None = None
    ) -> DataFrame:
        """SIMILAR / more-like-this (grn_ii_similar_search, ii.c:5836-5960):
        tokenize the input, keep the m rarest distinct terms (reference
        default m = (n_tokens >> 3) + 1; ties broken by term for
        determinism), OR their postings.  Pinned scorer: summed BM25 of the
        selected terms (the reference's w1·w2·(tf+weight) default scorer is
        pluggable; we pin BM25 engine-wide)."""
        return (
            self._similar_frame(text, max_terms)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "score")
        )

    def lcp_search(self, key: str) -> DataFrame:
        """LCP key lookup (grn_table_search GRN_OP_LCP → grn_pat_lcp_search,
        reference lib/db.c:2641-2741, lib/pat.c:968): the dictionary term
        that is the LONGEST prefix of ``key``.  A distributed filter
        ``term == substr(key, 1, len(term))`` + top-1 by key length — the
        lexicon is never collected."""
        esc = key.replace("\\", "\\\\").replace("'", "\\'")
        return (
            self.index.dictionary.filter(
                F.col("term") == F.expr(f"substr('{esc}', 1, length(term))")
            )
            .orderBy(F.length("term").desc(), F.col("term").asc())
            .limit(1)
            .select("term", "df")
        )

    def term_extract(self, text: str) -> DataFrame:
        """TERM_EXTRACT (*T) — entity extraction: which dictionary terms
        occur in the given text (grn_ii_term_extract ii.c:5965-6048 /
        grn_pat_scan pat.c:1553).  Returns (term, df) for each distinct
        token of the text present in the lexicon."""
        terms, _ = self._get_tokens(text)
        uniq = sorted(set(terms))
        if not uniq:
            return self.index.dictionary.sparkSession.createDataFrame(
                [], "term string, df long"
            )
        return (
            self.index.dictionary.filter(F.col("term").isin(uniq))
            .select("term", "df")
        )

    def _escalated(
        self,
        query: str,
        match_columns,
        k: int,
        scorer: str = "bm25",
        threshold: int = 0,
        base: DataFrame | None = None,
        base_n: int = 0,
    ) -> tuple[DataFrame, int]:
        """Match escalation chain (grn_ii_sel, reference ii.c:6659-6721):
        after EXACT, looser levels run while the accumulated hit count is
        <= threshold, each level's results OR-merged (score sum) into the
        set — the reference accumulates with GRN_OP_OR, it does not replace.

        * Level UNSPLIT (token_info_build via GRN_OP_UNSPLIT): the WHOLE
          normalized query string as a single lexicon key, prefix-expanded
          over the dictionary (pat prefix cursor) — catches queries the
          tokenizer split into non-existent tokens whose joined form is a
          dictionary term or term prefix.
        * Level PARTIAL (GRN_OP_PARTIAL): every query word prefix-expanded
          independently, OR-combined.

        Only plain term queries escalate (phrase/group/prefix/negation
        syntax is the user being explicit — same restraint as r1)."""
        from ..normalize import normalize as _norm

        spark = self.index.dictionary.sparkSession
        empty = spark.createDataFrame([], "doc_id long, score double")
        cur = base if base is not None else empty
        n = base_n

        def _finish(frame: DataFrame, count: int) -> tuple[DataFrame, int]:
            self.last_scored, self.last_n_hits = frame, count
            out = (
                frame.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
                .select("doc_id", "score")
            )
            return out, count

        if any(ch in query for ch in '"()*-:') or " OR " in f" {query} ":
            return _finish(cur, n)
        weights = self._resolve_weights(match_columns)
        words = [w for w in _norm(query).split() if w]
        if not words:
            return _finish(cur, n)

        # -- UNSPLIT: whole normalized query as one key, prefix-expanded --
        key = " ".join(words)
        lvl = self._prefix_expansion_frame(key, weights, scorer)
        if lvl is not None:
            cur = self._persist(self._or_merge(cur, lvl))
            n = cur.count()
            if n > threshold:
                return _finish(cur, n)

        # -- PARTIAL: per-word prefix expansions, OR-combined --------------
        if len(words) > 1:
            for w in words:
                lvl = self._prefix_expansion_frame(w, weights, scorer)
                if lvl is not None:
                    cur = self._or_merge(cur, lvl)
            cur = self._persist(cur)
            n = cur.count()
        return _finish(cur, n)

    def _prefix_expansion_frame(
        self, prefix: str, weights, scorer: str = "bm25"
    ) -> DataFrame | None:
        """Sum-scored (doc_id, score) over all dictionary terms with the
        given prefix (expansion capped at MAX_EXPANSIONS by df desc), or
        None when no term matches."""
        idx = self.index
        rows = (
            idx.dictionary.filter(F.col("term").startswith(prefix))
            .select("term", "df")
            .orderBy(F.desc("df"))
            .limit(MAX_EXPANSIONS)
            .collect()
        )
        terms = [r["term"] for r in rows]
        if not terms:
            return None
        term_doc, _ = self._scored_term_doc(terms, {}, weights, False, scorer)
        out = term_doc.groupBy("doc_id").agg(F.sum("score").alias("score"))
        if getattr(self, "_tfidf_mode", False):
            # the whole expansion is ONE token_info (ntoken=1,
            # size=Σ estimates) — scorer_tf_idf record semantics
            out = self._tfidf_scale(out, [terms])
        return out

    @staticmethod
    def _or_merge(a: DataFrame, b: DataFrame) -> DataFrame:
        """GRN_OP_OR result-set accumulation (db.c:3896-4007): union of doc
        sets, scores summed."""
        return (
            a.withColumnRenamed("score", "_sa")
            .join(b.withColumnRenamed("score", "_sb"), "doc_id", "full_outer")
            .select(
                "doc_id",
                (
                    F.coalesce(F.col("_sa"), F.lit(0.0))
                    + F.coalesce(F.col("_sb"), F.lit(0.0))
                ).alias("score"),
            )
        )

    # -- decoded + scored rows --------------------------------------------
    def _filtered_blocks(self, terms: list[str], term_meta: dict[str, int]):
        """Posting blocks of ``terms``, pruned two ways before any decode:

        1. a LITERAL ``pbucket IN (...)`` filter computed driver-side
           (hashutil replicates Spark's xxhash64, verified in
           tests/test_hashutil.py) — on a checkpoint-loaded index the
           postings parquet is *written* partitionBy("pbucket"), so this
           is directory-level partition pruning: ≤len(terms)/n_pbuckets of
           the index files are listed or read per query, the property that
           matters at 10^12 files.  On the in-memory cached index it
           skips cached batches via their min/max stats instead.
        2. the broadcast semi-join on the exact term strings.

        Reference analogue: grn_ii term lookup goes straight to the
        term's buffer via the lexicon's record id (ii.c grn_ii_cursor_open)
        — it never scans other terms' postings; pbucket pruning is the
        closest distributed equivalent."""
        idx = self.index
        npb = idx.n_pbuckets
        prows = getattr(idx, "postings_rows", None)
        posts = prows if prows is not None else idx.postings
        if npb and "pbucket" in posts.columns:
            buckets = sorted({term_pbucket(t, npb) for t in terms})
            if len(buckets) < npb:
                posts = posts.filter(F.col("pbucket").isin(buckets))
        tiny = idx.dictionary.sparkSession.createDataFrame(
            [(t,) for t in terms], "term string"
        )
        posts = posts.join(F.broadcast(tiny), "term")
        if prows is not None:
            # one-block-per-row layout (index/blockrows.py): rows ARE the
            # exploded shape; df is not stored per row (write-amp), so
            # attach it from the term-range-sorted dictionary — both
            # joins broadcast the same ≤MAX_EXPANSIONS term set
            ddf = idx.dictionary.join(F.broadcast(tiny), "term").select(
                "term", "df"
            )
            blocks = posts.join(F.broadcast(ddf), "term").drop(
                "pbucket", "gen"
            )
        else:
            blocks = posts.select(
                "term", "df", F.explode("blocks").alias("b")
            ).select("term", "df", "b.*")
        if not getattr(idx, "bounds_exact", True):
            # incrementally-updated index: untouched blocks are
            # byte-identical and their build-time max_score is stale under
            # the new stats — substitute the query-time sound bound
            # derived from (df, max_tf) (index/update.derived_bound_expr)
            from ..index.update import derived_bound_expr

            avgdl_max = max(
                idx.stats.avgdl(sid) for sid in idx.stats.section_tokens
            )
            blocks = blocks.withColumn(
                "max_score",
                F.expr(derived_bound_expr(idx.stats.n_docs, avgdl_max)),
            )
        return blocks

    def _anchor_pruned_blocks(self, blocks, anchor: str):
        """Prune every non-anchor term's blocks to the doc-id grid cells
        occupied by the ANCHOR term's postings.

        Sound whenever the anchor token is required in every matching doc
        (see ``_required_tokens``): result docs are then a subset of the
        anchor's docs, every posting of a doc in an anchor cell survives
        the prune (a block containing the doc overlaps its cell), so each
        sub-frame's membership AND score are exact for candidate docs —
        this is an exact rewrite, not a top-k bound.  Spark shape: the
        anchor decode is df_anchor rows, the cell set broadcasts (gated by
        MAX_BROADCAST_DOCS), the explode runs over block METADATA only
        (df/128 rows per term), and the kept-block semi-join never touches
        posting bytes.  Reference analogue: grn_ii_cursor_set_min's
        chunk-level rid skip (ii.c:4144-4172) driven by the rarest
        token_info's cursor (token_info_skip, ii.c:~5950).

        The kept-block set is tiny — (term, first_doc_id) pairs, bounded by
        Σ_t (df_t/512 + df_anchor) under the coverage gate — and the scored
        frame is referenced by several downstream branches (per-atom eval,
        positional candidate sets, n_hits), so ``keep`` goes through
        :meth:`_persist`: the whole anchor subtree (anchor decode → cells →
        metadata explode → semi-join) materializes exactly ONCE per query.
        Leaving it in the lineage re-ran it per branch — measured 2.2-2.8x
        slower than no prune at 1M docs before this."""
        G = _anchor_grid(self.index.stats.n_docs)
        ablocks = blocks.filter(F.col("term") == anchor)
        cells = (
            decoded_postings(ablocks, with_pos=False)
            .select((F.col("doc_id") / G).cast("long").alias("_cell"))
            .distinct()
        )
        others = blocks.filter(F.col("term") != anchor)
        keep = (
            others.select(
                "term",
                "first_doc_id",
                F.explode(
                    F.sequence(
                        (F.col("first_doc_id") / G).cast("long"),
                        (F.col("last_doc_id") / G).cast("long"),
                    )
                ).alias("_cell"),
            )
            .join(F.broadcast(cells), "_cell", "left_semi")
            .select("term", "first_doc_id")
            .distinct()
        )
        keep = self._persist(keep)
        pruned = others.join(F.broadcast(keep), ["term", "first_doc_id"], "left_semi")
        return ablocks.unionByName(pruned)

    def _scored_term_doc(
        self,
        terms,
        term_meta,
        weights,
        need_pos,
        scorer="bm25",
        pos_groups=None,
        anchor=None,
        pos_only=False,
    ):
        """decoded rows → (term, doc_id) score contributions; optionally the
        per-(term, doc, sid) position arrays for phrase/NEAR checks.
        ``pos_only=True`` asserts the caller's WHOLE plan is the single
        positional atom in ``pos_groups`` (its consumers only read
        term_doc rows for docs matching that atom), enabling the
        rarest-first masked decode below.

        ``pos_groups`` (a list of token lists, one per positional atom)
        turns the positional decode into TWO phases: a tf-only decode
        scores every posting cheaply, then positions are decoded only for
        blocks holding a CANDIDATE — a (doc, sid) containing every token
        of some group.  Every phrase/NEAR consumer inner-joins its tokens'
        rows on (doc_id, sid), so dropping non-candidates is exact; what
        it saves is decoding + Arrow-shipping the position arrays of every
        posting of a frequent term (at 1M docs a three-token phrase of
        head terms was 5.7× slower than its AND query through the
        single-phase path; candidate blocks are found by an equi
        semi-join on (term, _blk=first_doc_id) — no range join needed)."""
        idx = self.index
        blocks = self._filtered_blocks(terms, term_meta)
        if anchor is not None and anchor in terms and len(terms) > 1:
            blocks = self._anchor_pruned_blocks(blocks, anchor)
        # two-phase only pays when the positional tokens' postings are
        # big — below the cutoff the extra candidate shuffles cost more
        # than decoding the (small) position arrays outright.  Unknown
        # df (empty term_meta — the colop fast path) stays single-phase:
        # conformance-scale tables would eat the fixed overhead per query.
        two_phase = bool(need_pos and pos_groups) and (
            sum(
                term_meta.get(t, 0)
                for t in {t for g in pos_groups for t in g}
            )
            > POS_TWO_PHASE_CUTOFF
        )
        # rarest-first single-pass decode (token_compare's df-ascending
        # zipper, ii.c:5532-5537, pushed INTO the decode): when the whole
        # plan is ONE phrase/NEAR atom (``pos_only``), every downstream
        # consumer joins term_doc/pos_rows to the atom's candidates, and
        # every candidate must contain the group's rarest token — so the
        # rare token's doc set (collected, ≤ MAX_BROADCAST_DOCS ids) can
        # mask the OTHER terms' decode at the block level: blocks with no
        # candidate in [first, last] never decode, surviving blocks emit
        # only candidate rows.  This removes the head terms' full tf
        # decode + Arrow ship (the linear-in-df cost that dominated the
        # 10×-docs phrase/NEAR latency ratio) AND the separate phase-2
        # candidate aggregation/masked re-decode — one decode pass, with
        # positions, instead of two plus two shuffles.
        if (
            two_phase
            and pos_only
            and anchor is None
            and len(pos_groups) == 1
            and set(terms) == set(pos_groups[0])
            and len(set(pos_groups[0])) > 1
        ):
            g = sorted(set(pos_groups[0]))
            rare = min(g, key=lambda t: term_meta.get(t, 1 << 60))
            rare_df = term_meta.get(rare, 0)
            if 0 < rare_df <= MAX_BROADCAST_DOCS:
                rows_rare = self._persist(
                    decoded_postings(
                        blocks.filter(F.col("term") == rare), with_pos=True
                    )
                )
                cand = np.sort(
                    rows_rare.select("doc_id")
                    .distinct()
                    .toPandas()["doc_id"]
                    .to_numpy(dtype=np.int64)
                )
                rows_other = decoded_postings(
                    blocks.filter(F.col("term") != rare),
                    with_pos=True,
                    cand_global=cand,
                )
                rows = rows_rare.unionByName(rows_other)
                contrib = self._contrib_col(rows, weights, scorer)
                scored = self._persist(
                    rows.withColumn("contrib", contrib).filter(
                        F.col("contrib").isNotNull()
                    )
                )
                term_doc = scored.groupBy("term", "doc_id").agg(
                    F.sum("contrib").alias("score")
                )
                pos_rows = scored.select("term", "doc_id", "sid", "positions")
                return term_doc, pos_rows
        rows = decoded_postings(blocks, with_pos=need_pos and not two_phase,
                                with_block=bool(two_phase))
        contrib = self._contrib_col(rows, weights, scorer)
        scored = rows.withColumn("contrib", contrib).filter(F.col("contrib").isNotNull())
        if two_phase:
            # term_doc, the per-group presence sets, AND the candidate
            # aggregation all branch off this frame — cache it for the
            # query's duration so the tf decode runs once, not per branch
            scored = self._persist(scored)
        term_doc = scored.groupBy("term", "doc_id").agg(F.sum("contrib").alias("score"))
        if not need_pos:
            return term_doc, None
        if not two_phase:
            pos_rows = scored.select("term", "doc_id", "sid", "positions")
            return term_doc, pos_rows
        # -- phase 2: positions for candidate (doc, sid)s only -------------
        # candidate PAIRS (term, block, doc) rather than just blocks: a
        # spread candidate set over a head term touches nearly every block
        # (at 1M docs a 20k-doc candidate set hits ~97% of a df-660k
        # term's blocks), so block-level pruning alone re-decodes and
        # Arrow-ships almost all position arrays only for the downstream
        # join to drop them.  Instead each kept block carries its
        # candidate doc ids (array ≤ block size) INTO the decode UDF,
        # which masks rows before materializing positions — the shipped
        # rows drop from every posting of every kept block to exactly the
        # candidates.
        cand_pairs = None
        for g in pos_groups:
            gset = sorted(set(g))
            pres = scored.filter(F.col("term").isin(gset)).select(
                "term", "doc_id", "sid", "_blk"
            )
            rare = min(gset, key=lambda t: term_meta.get(t, 1 << 60))
            rare_df = term_meta.get(rare, 0)
            if len(gset) > 1 and 0 < rare_df <= MAX_BROADCAST_DOCS:
                # rarest-first reduction (token_compare's df-ascending
                # zipper, ii.c:5532-5537, as a broadcast): candidates must
                # contain the rarest token, so its (doc, sid) set —
                # bounded by rare_df — broadcast-semi-filters every other
                # token's rows MAP-SIDE before any shuffle.  The
                # countDistinct gate then aggregates ≤ |group|·rare_df
                # rows instead of the group's full Σ df (measured at 1M
                # docs, 3-token head phrase: the candidate stage shuffled
                # 1.25M rows → ~60k).
                rare_set = F.broadcast(
                    pres.filter(F.col("term") == rare)
                    .select("doc_id", "sid")
                    .distinct()
                )
                pres = pres.join(rare_set, ["doc_id", "sid"], "left_semi")
            # ONE aggregation produces both the all-tokens-present gate
            # and the surviving (term, _blk, doc) pairs: collecting the
            # (term, _blk) pairs alongside the distinct-term count and
            # exploding the survivors replaces the former
            # groupBy + semi-join-back (a second shuffle of the full
            # presence frame) with a map-side explode of the (small)
            # candidate rows — one shuffle and one job fewer per group
            pairs = (
                pres.groupBy("doc_id", "sid")
                .agg(
                    F.countDistinct("term").alias("_nt"),
                    F.collect_list(F.struct("term", "_blk")).alias("_tb"),
                )
                .filter(F.col("_nt") == len(gset))
                .select(
                    "doc_id", F.explode(F.array_distinct("_tb")).alias("_p")
                )
                .select(
                    F.col("_p.term").alias("term"),
                    F.col("_p._blk").alias("_blk"),
                    "doc_id",
                )
            )
            cand_pairs = (
                pairs if cand_pairs is None else cand_pairs.unionByName(pairs)
            )
        if POS_CAND_MASK:
            cand_docs = (
                cand_pairs.groupBy("term", "_blk")
                .agg(F.collect_set("doc_id").alias("_cand"))
                .withColumnRenamed("_blk", "first_doc_id")
            )
            pos_blocks = blocks.join(cand_docs, ["term", "first_doc_id"])
            pos_rows = decoded_postings(
                pos_blocks, with_pos=True, cand_col="_cand"
            ).select("term", "doc_id", "sid", "positions")
        else:
            blkset = (
                cand_pairs.select("term", "_blk")
                .distinct()
                .withColumnRenamed("_blk", "first_doc_id")
            )
            pos_blocks = blocks.join(
                blkset, ["term", "first_doc_id"], "left_semi"
            )
            pos_rows = decoded_postings(pos_blocks, with_pos=True).select(
                "term", "doc_id", "sid", "positions"
            )
        # every phrase/NEAR consumer reads pos_rows once PER TOKEN (the
        # per-token (doc, sid) joins) — without a persist the whole
        # phase-2 masked decode re-executes n_tokens times (measured ~3x
        # the 1.5 s decode at 1M docs).  The frame is candidate-sized.
        return term_doc, self._persist(pos_rows)

    def _contrib_col(self, rows, weights, scorer="bm25"):
        idx = self.index
        n = idx.stats.n_docs
        # weight + avgdl dispatch per section: tiny CASE WHEN chains (JVM)
        w_col = None
        for sid, w in weights.items():
            cond = F.col("sid") == sid
            w_col = F.when(cond, F.lit(w)) if w_col is None else w_col.when(cond, F.lit(w))
        if scorer == "tf_idf":
            # scorer_tf_idf (scorers.c:26-52): tf·log(N/df), floored at 1.0
            v = F.col("tf") * F.log(F.lit(float(n)) / F.col("df"))
            return w_col * F.greatest(v, F.lit(1.0))
        if scorer.startswith("tf_at_most:"):
            # scorer_tf_at_most(max) (scorers.c:54-88): min(tf, cap).
            # The cap is uniform ("tf_at_most:3.0") or per match_columns
            # entry by column name ("tf_at_most:title=3.0,body=7.0") —
            # the reference binds one scorer per section search
            # (grn_select match_columns, ii.c:6410-6426)
            spec = scorer.split(":", 1)[1]
            tf_d = F.col("tf").cast("double")
            if "=" not in spec:
                return w_col * F.least(tf_d, F.lit(float(spec)))
            col_caps = dict(
                (kv.split("=")[0], float(kv.split("=")[1]))
                for kv in spec.split(",")
                if kv
            )
            sid_caps = {
                sid: col_caps[c]
                for sid, c in idx.stats.sections.items()
                if c in col_caps
            }
            capped = None
            for sid, cap in sid_caps.items():
                cond = F.col("sid") == sid
                v = F.least(tf_d, F.lit(cap))
                capped = (
                    F.when(cond, v) if capped is None else capped.when(cond, v)
                )
            capped = tf_d if capped is None else capped.otherwise(tf_d)
            return w_col * capped
        if scorer == "tf":
            # Groonga's DEFAULT scorer (grn_ii_similar_search/grn_ii_select
            # accumulate 1 per occurrence × weight, ii.c): score = tf·w —
            # the integer _score the reference's .test fixtures expect
            return w_col * F.col("tf").cast("double")
        if scorer != "bm25":
            raise ValueError(f"unknown scorer {scorer!r}")
        avg_col = None
        for sid in weights:
            cond = F.col("sid") == sid
            a = float(idx.stats.avgdl(sid))
            avg_col = (
                F.when(cond, F.lit(a)) if avg_col is None else avg_col.when(cond, F.lit(a))
            )
        idf_c = F.log(
            1.0 + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        tfc = (F.col("tf") * (scoring.K1 + 1.0)) / (
            F.col("tf")
            + scoring.K1 * (1.0 - scoring.B + scoring.B * F.col("dl") / avg_col)
        )
        return w_col * idf_c * tfc

    # -- plan evaluation ----------------------------------------------------
    def _eval(self, node, term_doc, pos_rows, term_meta) -> DataFrame:
        if isinstance(node, _Atom):
            return self._eval_atom(node, term_doc, pos_rows)
        if isinstance(node, qp.ColumnOp):
            return self._eval_colop(node)
        if isinstance(node, qp.AllRecords):
            # all_records() injected by ALLOW_LEADING_NOT (expr.c:5917-5924)
            return self._docs_filter_frame(F.lit(True), 1.0)
        if isinstance(node, qp.Nothing):
            # dangling OR: zero hits, rc 0 (parser Nothing node)
            return self._docs_filter_frame(F.lit(False), 0.0)
        if isinstance(node, qp.And):
            # fuse scan-path column-operator children into ONE filtered
            # scan: each contributes a constant 1.0 per match, so the fused
            # frame scores len(conds).  N colops become one pruned parquet
            # scan instead of N scans + N-1 self-joins (the reference's
            # scan executor also evaluates them as a single sequential
            # pass, operator.c:904-930).
            scan_conds, rest = [], []
            for ch in node.children:
                fc = (
                    self._colop_filter_cond(ch)
                    if isinstance(ch, qp.ColumnOp) and self.docs is not None
                    else None
                )
                (scan_conds if fc is not None else rest).append(fc if fc is not None else ch)
            fused = None
            if len(scan_conds) >= 2:
                cond = scan_conds[0]
                for fc in scan_conds[1:]:
                    cond = cond & fc
                fused = self._docs_filter_frame(cond, float(len(scan_conds)))
                if not rest:
                    return fused
            else:
                rest = list(node.children)
            children = sorted(rest, key=_est_df)
            out = self._eval(children[0], term_doc, pos_rows, term_meta)
            out_est = _est_df(children[0])
            for c in children[1:]:
                nxt = self._eval(c, term_doc, pos_rows, term_meta).withColumnRenamed(
                    "score", "_s2"
                )
                # the running intersection is bounded by the rarest child's
                # df, which the planner knows from the dictionary — hint a
                # broadcast when either side is provably small, replacing
                # the SortMergeJoin's two exchanges (Catalyst can't infer
                # these sizes through the decode UDF)
                c_est = _est_df(c)
                if out_est <= MAX_BROADCAST_DOCS and out_est <= c_est:
                    joined = F.broadcast(out).join(nxt, "doc_id")
                elif c_est <= MAX_BROADCAST_DOCS:
                    joined = out.join(F.broadcast(nxt), "doc_id")
                else:
                    joined = out.join(nxt, "doc_id")
                out = joined.withColumn(
                    "score", F.col("score") + F.col("_s2")
                ).drop("_s2")
                out_est = min(out_est, c_est)
            if fused is not None:
                # the fused scan joins last (cardinality unknown); the
                # scored side is bounded by the rarest term's df
                left = F.broadcast(out) if out_est <= MAX_BROADCAST_DOCS else out
                out = (
                    left.join(fused.withColumnRenamed("score", "_s2"), "doc_id")
                    .withColumn("score", F.col("score") + F.col("_s2"))
                    .drop("_s2")
                )
            return out
        if isinstance(node, qp.Or):
            out = self._eval(node.children[0], term_doc, pos_rows, term_meta)
            for c in node.children[1:]:
                nxt = self._eval(c, term_doc, pos_rows, term_meta).withColumnRenamed(
                    "score", "_s2"
                )
                out = (
                    out.join(nxt, "doc_id", "full_outer")
                    .withColumn(
                        "score",
                        F.coalesce(F.col("score"), F.lit(0.0))
                        + F.coalesce(F.col("_s2"), F.lit(0.0)),
                    )
                    .drop("_s2")
                )
            return out
        if isinstance(node, qp.Not):
            pos = self._eval(node.positive, term_doc, pos_rows, term_meta)
            neg_node = node.negative
            if (
                isinstance(neg_node, _Atom)
                and neg_node.kind == "term"
                and len(neg_node.tokens) == 1
                and neg_node.tokens[0] in getattr(self, "_neg_only_terms", ())
            ):
                # membership-only decode: the anti-join right side never
                # needs scores, sections, or distinct docs
                neg = self._neg_doc_ids(neg_node.tokens[0])
            else:
                neg = self._eval(neg_node, term_doc, pos_rows, term_meta).select(
                    "doc_id"
                )
            if _est_df(node.negative) <= MAX_BROADCAST_DOCS:
                neg = F.broadcast(neg)
            return pos.join(neg, "doc_id", "left_anti")
        raise TypeError(node)

    def _neg_doc_ids(self, term: str) -> DataFrame:
        """doc_ids holding ``term`` (any section; duplicates fine) via the
        doc-delta-only decode — the cheap AND_NOT right side
        (grn_ii_resolve_sel_and, ii.c:6740)."""
        from .decode import decoded_doc_ids

        return decoded_doc_ids(self._filtered_blocks([term], {}))

    def _tfidf_idf(self, tis: "list[list[str]]") -> "float | None":
        """Record-level idf of scorer_tf_idf (scorers.c:26-52).  Each
        entry of ``tis`` is one token_info's term group (a prefix
        expansion is ONE ti); n_candidates sums grn_ii_estimate_size over
        the groups (ii.c:4470: an embedded single posting estimates 1,
        otherwise df + the 2 array slots), n_tokens counts the groups.
        None → degenerate (estimated matches ≥ corpus) → min score 1."""
        import math

        terms = sorted({t for g in tis for t in g})
        if not terms or not tis:
            return None
        rows = (
            self.index.dictionary.filter(F.col("term").isin(terms))
            .select("term", "df", "cf")
            .collect()
        )
        es = {
            r["term"]: 1 if (int(r["df"]) == 1 and int(r["cf"]) == 1)
            else int(r["df"]) + 2
            for r in rows
        }
        n_cand = sum(sum(es.get(t, 0) for t in g) for g in tis)
        n_est = n_cand / len(tis)
        n_all = self.index.stats.n_docs
        if n_cand <= 0 or n_est >= n_all:
            return None
        return math.log(n_all / n_est)

    def _tfidf_scale(self, out: DataFrame, tis: "list[list[str]]") -> DataFrame:
        idf = self._tfidf_idf(tis)
        score = (
            F.lit(1.0) if idf is None
            else F.greatest(F.col("score") * F.lit(idf), F.lit(1.0))
        )
        return out.withColumn("score", score)

    def _eval_atom(self, a: _Atom, term_doc, pos_rows) -> DataFrame:
        if getattr(self, "_tfidf_mode", False):
            out = self._eval_atom_tf(a, term_doc, pos_rows)
            tis = [a.expansions] if a.kind == "prefix" else [[t] for t in a.tokens]
            return self._tfidf_scale(out, tis)
        return self._eval_atom_tf(a, term_doc, pos_rows)

    def _eval_atom_tf(self, a: _Atom, term_doc, pos_rows) -> DataFrame:
        if a.kind == "term":
            return term_doc.filter(F.col("term") == a.tokens[0]).select("doc_id", "score")
        if a.kind == "prefix":
            if not a.expansions:
                return term_doc.sparkSession.createDataFrame([], "doc_id long, score double")
            return (
                term_doc.filter(F.col("term").isin(a.expansions))
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
            )
        if a.kind == "phrase":
            return self._eval_phrase(a, term_doc, pos_rows)
        if a.kind == "near":
            return self._eval_near(a, term_doc, pos_rows)
        raise ValueError(a.kind)

    def _eval_colop(self, c: qp.ColumnOp) -> DataFrame:
        """``column:value`` atom → (doc_id, score) frame.

        Wiring per the r1 verdict: ``^`` → lexicon prefix expansion,
        ``$`` → reversed-term suffix range scan, ``~`` → regexp scan
        fallback, ``@`` → indexed section match; scalar comparisons and
        any operator on an unindexed column filter the source frame —
        Catalyst pushes those predicates into the parquet scan.  Filter
        atoms score 1.0 per matching record (the scan path's behavior,
        operator.c:904-930); indexed match/prefix/suffix keep BM25."""
        col_to_sid = {col: sid for sid, col in self.index.stats.sections.items()}
        sid = None if c.column in self.scan_columns else col_to_sid.get(c.column)

        if c.op in ("match", "prefix", "suffix") and sid is not None:
            weights = {sid: 1.0}
            if c.op == "match":
                terms, offs = self._get_tokens(c.value)
                if not terms:
                    return self._empty_frame()
                terms, offs, as_prefix = self._adjust_ngram_tail(terms, offs)
                if as_prefix:
                    frame = self._prefix_expansion_frame(terms[0], weights)
                    return frame if frame is not None else self._empty_frame()
                term_doc, pos_rows = self._scored_term_doc(
                    sorted(set(terms)), {}, weights, need_pos=len(terms) > 1,
                    pos_groups=[terms], pos_only=len(terms) > 1,
                )
                kind = "phrase" if len(terms) > 1 else "term"
                a = _Atom(tokens=terms, offsets=offs, kind=kind)
                return self._eval_atom(a, term_doc, pos_rows)
            if c.op == "prefix":
                frame = self._prefix_expansion_frame(c.value.lower(), weights)
                return frame if frame is not None else self._empty_frame()
            # suffix: reversed-term range scan restricted to the section
            return self._suffix_frame(c.value.lower(), weights)

        return self._docs_filter_frame(self._colop_filter_cond(c), 1.0)

    def _colop_filter_cond(self, c: qp.ColumnOp):
        """Column predicate for a scan-path colop, or None when the atom
        resolves through the index (match/prefix/suffix on an indexed
        section).  A plain predicate — no null-coalescing wrapper — so
        Catalyst translates it into parquet ``PushedFilters`` (a NULL
        predicate drops the row in a filter exactly like coalesce-false)."""
        if c.op in ("match", "prefix", "suffix"):
            if (
                c.column in set(self.index.stats.sections.values())
                and c.column not in self.scan_columns
            ):
                return None
        col = F.col(c.column)
        # a reference column compares/matches via the referenced record's
        # _key (the reference casts reference values to their key —
        # suite/select/query/less/reference.test: Users.age is a
        # reference to Ages yet `age:<22` compares the UInt8 key)
        if self.docs is not None and c.column in self.docs.columns:
            from pyspark.sql.types import StructType

            dt = self.docs.schema[c.column].dataType
            if isinstance(dt, StructType) and "_key" in dt.fieldNames():
                col = col.getField("_key")
        if c.op in ("equal", "not_equal", "less", "greater", "less_equal", "greater_equal"):
            val = c.value if c.quoted else _coerce(c.value)
            return {
                "equal": col == val,
                "not_equal": col != val,
                "less": col < val,
                "greater": col > val,
                "less_equal": col <= val,
                "greater_equal": col >= val,
            }[c.op]
        # string-match scan ops compare NormalizerAuto-normalized text
        # (the reference's scan path normalizes the haystack — the
        # `name:@aRl` → "Carlos" fixture, suite/select/query/match/
        # no_index.test; the ASCII normalizer is a case fold, F.lower
        # stays JVM-side).  This costs parquet pushdown for these four
        # ops — scalar comparisons above keep PushedFilters, and large-
        # scale string match should go through the index anyway.
        if c.op == "match":  # unindexed substring scan (operator.c:904)
            return F.lower(col).contains(c.value.lower())
        if c.op == "prefix":
            return F.lower(col).startswith(c.value.lower())
        if c.op == "suffix":
            return F.lower(col).endswith(c.value.lower())
        if c.op == "regexp":
            # regexp stays a scan even on indexed columns: only a
            # TokenRegexp lexicon can index-accelerate it soundly
            # (regexp_index_search is that path).  Case-insensitivity via
            # the (?i) flag, NOT by lowercasing the pattern — folding the
            # pattern corrupts escapes (\A → \a) and class ranges
            # (suite/select/filter/no_index/regexp/text_text: '\\AGr'
            # must match 'Groonga')
            return col.rlike("(?i)" + c.value)
        raise ValueError(c.op)

    def _docs_filter_frame(self, cond, score: float) -> DataFrame:
        """(doc_id, score) frame for a scan-path predicate over the source
        table; ``score`` is the constant contribution (1.0 per filter atom,
        operator.c:904-930)."""
        docs = self.docs
        if docs is None:
            raise ValueError(
                "column operator needs the source frame; "
                "set engine.docs after loading from a checkpoint"
            )
        return docs.filter(cond).select(
            F.col(self.id_col).alias("doc_id"), F.lit(score).alias("score")
        )

    def _empty_frame(self) -> DataFrame:
        return self.index.dictionary.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )

    def _suffix_frame(self, suffix: str, weights) -> DataFrame:
        """Full (doc_id, score) frame for a suffix search — reversed-term
        prefix range scan over the dictionary (pat.c:1023 SIS analogue)."""
        idx = self.index
        rows = (
            idx.dictionary.filter(F.col("rterm").startswith(suffix[::-1]))
            .select("term", "df")
            .orderBy(F.desc("df"))
            .limit(MAX_EXPANSIONS)
            .collect()
        )
        terms = [r["term"] for r in rows]
        if not terms:
            return self._empty_frame()
        term_doc, _ = self._scored_term_doc(terms, {}, weights, False, "bm25")
        return term_doc.groupBy("doc_id").agg(F.sum("score").alias("score"))

    def _similar_frame(
        self,
        text: str,
        max_terms: int | None = None,
        scorer: str = "bm25",
        threshold: int | None = None,
    ) -> DataFrame:
        """Full scored frame of SIMILAR search (grn_ii_similar_search,
        ii.c:5836-5960) — the *S pragma body and similar_search share it.

        Under ``scorer="tf"`` (the reference's default scorer) this is the
        exact reference algorithm: per distinct lexicon term,
        ``w1 = query_tf + max_size // estimate_size`` (max_size 2**20,
        ii.c:5858); keep the top ``limit`` terms by w1 where ``limit =
        similarity_threshold or (n_terms >> 3) + 1`` (ii.c:5892-5897); a
        doc scores ``Σ w1·w2·(tf+weight)`` = Σ w1·tf with unit section
        weights (ii.c:5948).  ``grn_ii_estimate_size`` (ii.c:4470) is the
        term's posting size: 1 for an embedded single posting, else the
        buffer byte estimate — we model it as cf (total occurrences),
        exact for the embedded case and proportional otherwise.

        Other scorers keep the r1 behavior: the ``(n >> 3) + 1`` rarest
        terms by df, summed per-posting scores."""
        idx = self.index
        terms, _ = self._get_tokens(text)
        if not terms:
            return self._empty_frame()
        weights = {sid: 1.0 for sid in idx.stats.sections}
        if scorer == "tf":
            qtf: dict[str, int] = {}
            for t in terms:
                qtf[t] = qtf.get(t, 0) + 1
            rows = (
                idx.dictionary.filter(F.col("term").isin(sorted(qtf)))
                .select("term", "df", "cf")
                .collect()
            )
            # grn_ii_estimate_size (ii.c:4470): an embedded single posting
            # (df 1, tf 1) estimates 1; otherwise df postings + 2 slots
            w1 = {
                r["term"]: qtf[r["term"]] + 1048576 // (
                    1 if (int(r["df"]) == 1 and int(r["cf"]) == 1)
                    else int(r["df"]) + 2
                )
                for r in rows
                if int(r["df"]) > 0
            }
            if not w1:
                return self._empty_frame()
            limit = (
                min(threshold, len(w1)) if threshold else (len(w1) >> 3) + 1
            )
            sel = sorted(w1, key=lambda t: (-w1[t], t))[:limit]
            term_doc, _ = self._scored_term_doc(sel, {}, weights, False, "tf")
            w1_map = F.create_map(
                *[x for t in sel for x in (F.lit(t), F.lit(float(w1[t])))]
            )
            return (
                term_doc.withColumn("score", F.col("score") * w1_map[F.col("term")])
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
            )
        uniq = sorted(set(terms))
        m = (
            max_terms
            if max_terms is not None
            else (threshold or (len(uniq) >> 3) + 1)
        )
        rows = (
            idx.dictionary.filter(F.col("term").isin(uniq))
            .select("term", "df")
            .orderBy(F.asc("df"), F.asc("term"))
            .limit(m)
            .collect()
        )
        sel = [r["term"] for r in rows]
        if not sel:
            return self._empty_frame()
        term_doc, _ = self._scored_term_doc(sel, {}, weights, False, scorer)
        return term_doc.groupBy("doc_id").agg(F.sum("score").alias("score"))

    def _term_extract_frame(self, text: str) -> DataFrame:
        """*T pragma: extract lexicon terms occurring in the text
        (grn_ii_term_extract, ii.c:5965-6048), then OR-match the docs
        containing them, scores summed."""
        terms, _ = self._get_tokens(text)
        uniq = sorted(set(terms))
        if not uniq:
            return self._empty_frame()
        rows = (
            self.index.dictionary.filter(F.col("term").isin(uniq))
            .select("term")
            .collect()
        )
        found = [r["term"] for r in rows]
        if not found:
            return self._empty_frame()
        weights = {sid: 1.0 for sid in self.index.stats.sections}
        term_doc, _ = self._scored_term_doc(found, {}, weights, False, "bm25")
        return term_doc.groupBy("doc_id").agg(F.sum("score").alias("score"))

    def _phrase_candidates(self, a: _Atom, pos_rows, counts: bool = False) -> DataFrame:
        """(doc_id) where the token sequence occurs at consecutive offsets in
        at least one section — array_intersect over offset-shifted position
        arrays, all JVM-side.  ``counts=True`` keeps the per-(doc, sid)
        occurrence count for tf-scorer phrase scoring."""
        uniq = list(dict.fromkeys(a.tokens))
        base = None
        for i, (t, off) in enumerate(zip(a.tokens, a.offsets)):
            r = (
                pos_rows.filter(F.col("term") == t)
                .select(
                    "doc_id",
                    "sid",
                    F.expr(f"transform(positions, x -> x - {off})").alias(f"_p{i}"),
                )
            )
            base = r if base is None else base.join(r, ["doc_id", "sid"])
        inter = F.col("_p0")
        for i in range(1, len(a.tokens)):
            inter = F.array_intersect(inter, F.col(f"_p{i}"))
        out = base.withColumn("_noccur", F.size(inter)).filter(F.col("_noccur") > 0)
        if counts:
            return out.select("doc_id", "sid", "_noccur")
        return out.select("doc_id").distinct()

    def _phrase_score(self, a: _Atom, term_doc, cands: DataFrame) -> DataFrame:
        uniq = list(dict.fromkeys(a.tokens))
        sc = (
            term_doc.filter(F.col("term").isin(uniq))
            .join(cands, "doc_id")
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
        )
        return sc

    def _eval_phrase(self, a: _Atom, term_doc, pos_rows) -> DataFrame:
        if getattr(self, "_cur_scorer", None) == "tf":
            # the reference's EXACT mode adds weight once per matched
            # PHRASE OCCURRENCE, not per constituent gram (grn_ii_select
            # phrase loop ii.c:6499-6527 → res_add with the section
            # weight; select/function/query/selector: "ali" under a ×10
            # section weights 10, not 20)
            cc = self._phrase_candidates(a, pos_rows, counts=True)
            w_col = None
            for sid, w in (self._cur_weights or {1: 1.0}).items():
                cond = F.col("sid") == sid
                w_col = (
                    F.when(cond, F.lit(w)) if w_col is None
                    else w_col.when(cond, F.lit(w))
                )
            return (
                cc.withColumn("score", F.col("_noccur") * w_col)
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
            )
        return self._phrase_score(a, term_doc, self._phrase_candidates(a, pos_rows))

    def _eval_near(self, a: _Atom, term_doc, pos_rows) -> DataFrame:
        """NEAR (*N): all tokens within max_interval positions
        (sliding min-heap in Groonga, ii.c:6471-6497) — candidates come from
        the (doc, sid) intersection; the window check runs as a vectorized
        UDF over the (small) per-candidate position arrays."""
        offsets = a.offsets
        max_iv = a.max_interval

        base = None
        for i, t in enumerate(a.tokens):
            r = pos_rows.filter(F.col("term") == t).select(
                "doc_id", "sid", F.col("positions").alias(f"_p{i}")
            )
            base = r if base is None else base.join(r, ["doc_id", "sid"])

        n_tok = len(a.tokens)

        if getattr(self, "_cur_scorer", None) == "tf":
            # reference default scorer: _score = number of greedy NEAR
            # windows (noccur, ii.c:6531-6539) × section weight — not the
            # constituent terms' tf sum
            @F.pandas_udf(IntegerType())
            def near_n(*cols: pd.Series) -> pd.Series:
                out = []
                for row in zip(*cols):
                    lists = [
                        sorted(x - offsets[i] for x in row[i])
                        for i in range(n_tok)
                    ]
                    out.append(_near_count(lists, max_iv))
                return pd.Series(out)

            w_col = None
            for sid, w in (self._cur_weights or {1: 1.0}).items():
                cond = F.col("sid") == sid
                w_col = (
                    F.when(cond, F.lit(w)) if w_col is None
                    else w_col.when(cond, F.lit(w))
                )
            return (
                base.withColumn(
                    "_n", near_n(*[F.col(f"_p{i}") for i in range(n_tok)])
                )
                .filter(F.col("_n") > 0)
                .withColumn("score", F.col("_n") * w_col)
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
            )

        @F.pandas_udf(BooleanType())
        def near_ok(*cols: pd.Series) -> pd.Series:
            out = []
            for row in zip(*cols):
                lists = [sorted(x - offsets[i] for x in row[i]) for i in range(n_tok)]
                ok = _near_window(lists, max_iv)
                out.append(ok)
            return pd.Series(out)

        cands = (
            base.withColumn("_ok", near_ok(*[F.col(f"_p{i}") for i in range(n_tok)]))
            .filter(F.col("_ok"))
            .select("doc_id")
            .distinct()
        )
        return self._phrase_score(a, term_doc, cands)

    # -- block-max top-k (single term) --------------------------------------
    def _single_term_topk(self, term: str, term_meta, weights, k: int) -> DataFrame:
        """Two-phase Block-Max pruning: phase 1 decodes just enough
        highest-max_score blocks to cover k postings and fixes a true lower
        bound θ on the k-th score; phase 2 decodes only blocks with
        max_score >= θ.  Strictly-below-θ blocks cannot affect the top-k
        (ties keep, so rank identity is preserved).  The caller guarantees a
        single matched section, so the weighted block bound is sound."""
        (sec_weight,) = weights.values()
        blocks = self._filtered_blocks([term], term_meta)
        if term_meta.get(term, 0) <= SINGLE_TERM_PRUNE_CUTOFF:
            # small term: the two driver collects below cost more than
            # decoding every posting — one job, no pruning
            rows = decoded_postings(blocks, with_pos=False)
            scored = rows.withColumn("contrib", self._contrib_col(rows, weights))
            return (
                scored.filter(F.col("contrib").isNotNull())
                .groupBy("doc_id")
                .agg(F.sum("contrib").alias("score"))
            )
        # phase-1 block pick runs on METADATA ONLY: TakeOrderedAndProject
        # over (first_doc_id, n, max_score) — a distributed partial sort of
        # 3 small columns, never the encoded byte columns.  Since every
        # block holds >= 1 posting, the k highest-max_score blocks cover
        # >= k postings; the driver trims that list to the covering prefix
        # (usually a single 128-posting block for k=10).  The previous
        # shape ran an unpartitioned Window over FULL block rows — at a
        # 100M-doc term that funnels ~800k rows *with their posting bytes*
        # through one partition, twice (both phases filtered the windowed
        # frame).
        cand = (
            blocks.select("first_doc_id", "n", "max_score")
            .orderBy(F.desc("max_score"), F.asc("first_doc_id"))
            .limit(k)
            .collect()
        )
        sel: list[int] = []
        cum = 0
        for r in cand:
            sel.append(int(r["first_doc_id"]))
            cum += int(r["n"])
            if cum >= k:
                break
        phase1 = blocks.filter(F.col("first_doc_id").isin(sel))
        rows1 = decoded_postings(phase1, with_pos=False)
        scored1 = rows1.withColumn("contrib", self._contrib_col(rows1, weights))
        td1 = scored1.filter(F.col("contrib").isNotNull()).groupBy("doc_id").agg(
            F.sum("contrib").alias("score")
        )
        if len(sel) == len(cand) and len(cand) < k:
            # limit(k) returned every block the term has and none were
            # trimmed — phase 1 already decoded the whole posting list
            return td1
        top1 = td1.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
        # theta is a TRUE lower bound on the final k-th score even though
        # phase-1 doc scores can be partial (a doc's sections may span
        # unselected blocks): partial <= full, so >= k docs have full
        # score >= theta
        if len(top1) < k:
            theta = float("-inf")
        else:
            theta = _theta_slack(float(top1[-1]["score"]))
        surv = blocks.filter(
            F.col("max_score") * F.lit(float(sec_weight)) >= F.lit(theta)
        )
        rows2 = decoded_postings(surv, with_pos=False)
        scored2 = rows2.withColumn("contrib", self._contrib_col(rows2, weights))
        return (
            scored2.filter(F.col("contrib").isNotNull())
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("score"))
        )

    # -- block-max WAND (disjunctive OR top-k) -------------------------------
    def _wand_or_topk(self, tokens, term_meta, weights, k: int) -> DataFrame:
        """Block-Max WAND over a pure term disjunction (the reference keeps
        per-chunk skip metadata, chunk_info ii.c:2491-2495; published BMW
        generalizes it with per-block score bounds — our blocks carry
        max_score, a BM25 bound, from the build).

        Phase 1 decodes each term's covering prefix of highest-max_score
        blocks (metadata-only per-term pick; ≤ k·n_terms rows reach the
        driver) and takes the k-th best PARTIAL doc score as θ — partial ≤
        full, so ≥ k docs have full score ≥ θ and θ lower-bounds the true
        k-th score.  Phase 2 prunes blocks two ways before the real decode:

        * **WAND bound** (driver-side, zero extra jobs): a block of term t
          is kept iff ``w·max_score + Σ_{u≠t} w·gmax_u ≥ θ`` — any doc
          whose full score reaches θ has, for EACH of its blocks, a
          contribution ≥ θ − (other terms' global best), so all its blocks
          survive.
        * **BMW cell bound** (two metadata-only aggregations): per doc-grid
          cell, ``UB(cell) = w·Σ_t max(max_score of t's surviving blocks
          overlapping the cell)`` upper-bounds every resident doc's full
          score (each doc's blocks survive level 1, see above, so the
          per-term max is over a superset containing its own block).  Cells
          with UB < θ are dropped; a block is kept iff it overlaps a kept
          cell.  Skipped when the terms' block-metadata row count exceeds
          WAND_CELL_MAX_META (the kept-pair broadcast bound).

        Docs losing any block to the prune have true score < θ ≤ true k-th
        score and computed partial ≤ true, so they can never displace a
        top-k doc — the caller's ``orderBy(score desc, doc_id).limit(k)``
        over this frame is rank-identical to the unpruned evaluation (ties
        kept: both bounds use ≥).  Requires the single-section guarantee
        (one posting per (term, doc) → per-block max bounds the per-term
        contribution)."""
        from pyspark.sql import Window as _W

        (sec_weight,) = weights.values()
        w = float(sec_weight)
        blocks = self._filtered_blocks(tokens, term_meta)
        meta = blocks.select("term", "first_doc_id", "last_doc_id", "n", "max_score")
        rw = _W.partitionBy("term").orderBy(
            F.desc("max_score"), F.asc("first_doc_id")
        )
        cand = (
            meta.withColumn("_rn", F.row_number().over(rw))
            .filter(F.col("_rn") <= k)
            .select("term", "first_doc_id", "n", "max_score", "_rn")
            .collect()
        )
        by_term: dict = {}
        for r in cand:
            by_term.setdefault(r["term"], []).append(r)
        sel: list[tuple[str, int]] = []
        gmax: dict[str, float] = {}
        for t, rs in by_term.items():
            rs.sort(key=lambda r: r["_rn"])
            gmax[t] = float(rs[0]["max_score"])
            cum = 0
            for r in rs:
                sel.append((t, int(r["first_doc_id"])))
                cum += int(r["n"])
                if cum >= k:
                    break
        spark = self.index.dictionary.sparkSession
        sel_df = spark.createDataFrame(sel, "term string, first_doc_id long")
        phase1 = blocks.join(
            F.broadcast(sel_df), ["term", "first_doc_id"], "left_semi"
        )

        def _score(frame):
            rows = decoded_postings(frame, with_pos=False)
            scored = rows.withColumn("contrib", self._contrib_col(rows, weights))
            return (
                scored.filter(F.col("contrib").isNotNull())
                .groupBy("doc_id")
                .agg(F.sum("contrib").alias("score"))
            )

        top1 = (
            _score(phase1)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        if len(top1) < k:
            # θ would be -inf — nothing prunable, decode the union
            return _score(blocks)
        theta = _theta_slack(float(top1[-1]["score"]))
        sum_gmax = sum(gmax.values())
        lvl1 = None
        for t in tokens:
            need = theta / w - (sum_gmax - gmax.get(t, 0.0))
            c = (F.col("term") == t) & (F.col("max_score") >= F.lit(need))
            lvl1 = c if lvl1 is None else (lvl1 | c)
        surv = blocks.filter(lvl1)
        from ..index.build import BLOCK_SIZE

        est_meta = sum(term_meta.get(t, 0) for t in tokens) // BLOCK_SIZE
        if est_meta <= WAND_CELL_MAX_META:
            G = _anchor_grid(self.index.stats.n_docs)
            mc = surv.select(
                "term",
                "first_doc_id",
                "max_score",
                F.explode(
                    F.sequence(
                        (F.col("first_doc_id") / G).cast("long"),
                        (F.col("last_doc_id") / G).cast("long"),
                    )
                ).alias("_cell"),
            )
            ub_cells = (
                mc.groupBy("_cell", "term")
                .agg(F.max("max_score").alias("_m"))
                .groupBy("_cell")
                .agg(F.sum("_m").alias("_ub"))
                .filter(F.col("_ub") * F.lit(w) >= F.lit(theta))
                .select("_cell")
            )
            keep = (
                mc.join(ub_cells, "_cell", "left_semi")
                .select("term", "first_doc_id")
                .distinct()
            )
            surv = surv.join(
                F.broadcast(keep), ["term", "first_doc_id"], "left_semi"
            )
        return _score(surv)


def _required_tokens(node) -> set:
    """Tokens provably present in EVERY doc matching ``node`` (the sound
    anchor candidates for ``_anchor_pruned_blocks``).  term/phrase/NEAR
    atoms require all their tokens (NEAR inner-joins every token's
    positions); prefix/colop/AllRecords require none; And unions, Or
    intersects, Not requires whatever its positive side requires."""
    if isinstance(node, _Atom):
        return set(node.tokens) if node.kind in ("term", "phrase", "near") else set()
    if isinstance(node, qp.And):
        req: set = set()
        for c in node.children:
            req |= _required_tokens(c)
        return req
    if isinstance(node, qp.Or):
        sets = [_required_tokens(c) for c in node.children]
        req = sets[0]
        for s in sets[1:]:
            req &= s
        return req
    if isinstance(node, qp.Not):
        return _required_tokens(node.positive)
    return set()


def _neg_simple_atoms(node) -> list:
    """Single-token term atoms standing as the ENTIRE negative side of a
    Not node — the only atoms whose scores are provably discarded (the
    anti-join keeps just membership), so select() may exclude them from
    the scored decode when they occur nowhere else."""
    out: list = []
    if isinstance(node, qp.Not):
        neg = node.negative
        if isinstance(neg, _Atom) and neg.kind == "term" and len(neg.tokens) == 1:
            out.append(neg)
        else:
            out += _neg_simple_atoms(neg)
        out += _neg_simple_atoms(node.positive)
    elif isinstance(node, (qp.And, qp.Or)):
        for c in node.children:
            out += _neg_simple_atoms(c)
    return out


def _est_df(node) -> int:
    if isinstance(node, _Atom):
        return node.est_df
    if isinstance(node, (qp.And,)):
        return min((_est_df(c) for c in node.children), default=0)
    if isinstance(node, (qp.Or,)):
        return sum(_est_df(c) for c in node.children)
    if isinstance(node, qp.Not):
        return _est_df(node.positive)
    return 1 << 60  # ColumnOp scans: cardinality unknown → join last


def _expand_ast(node, table: "dict[str, list[str]]"):
    """Query expansion (QueryExpanderTSV, plugins/query_expanders/tsv.c):
    a Term whose text is a key of ``table`` becomes the OR of its
    substitution terms; everything else passes through.  Phrases/NEAR and
    column operators are not expanded (the reference expands word tokens
    only)."""
    if isinstance(node, qp.Term) and not node.prefix:
        subs = table.get(node.text)
        if subs:
            terms = [qp.Term(s[:-1], prefix=True) if s.endswith("*") and len(s) > 1
                     else qp.Term(s) for s in subs]
            return terms[0] if len(terms) == 1 else qp.Or(terms)
        return node
    if isinstance(node, (qp.And, qp.Or)):
        return type(node)([_expand_ast(c, table) for c in node.children])
    if isinstance(node, qp.Not):
        return qp.Not(_expand_ast(node.positive, table), _expand_ast(node.negative, table))
    return node


def _strip_pragmas(q: str) -> str:
    """Drop leading *E/*D/*W pragma words so the escalation chain sees the
    query BODY (*N stays — it's body syntax; *S/*T never escalate)."""
    words = q.split()
    i = 0
    while (
        i < len(words)
        and len(words[i]) > 1
        and words[i][0] == "*"
        and words[i][1] in "EDW"
    ):
        i += 1
    return " ".join(words[i:])


def _has_colop(node) -> bool:
    if isinstance(node, (qp.ColumnOp, qp.AllRecords)):
        return True
    if isinstance(node, (qp.And, qp.Or)):
        return any(_has_colop(c) for c in node.children)
    if isinstance(node, qp.Not):
        return _has_colop(node.positive) or _has_colop(node.negative)
    return False


def _coerce(value: str):
    """Unquoted column-op literal → int/float when it looks numeric
    (Groonga casts by column type; Catalyst's coercion does the rest)."""
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        return value


def _required_literal(core: str) -> tuple[str, tuple[int, int]] | None:
    """Longest literal run PROVABLY required by every match of ``core``
    (soundness gate for the bigram index prefilter — a false 'required'
    literal silently drops true matches).  Conservative scanner:

    * only top-level alphanumeric runs count — characters inside ``[...]``
      classes or ``(...)`` groups are skipped (a class is an alternative;
      a group may be alternated or quantified away);
    * a top-level ``|`` means NOTHING is required → None (scan fallback);
    * a char immediately after ``\\`` is an escape, never a literal
      (``foo\\dbar`` requires 'foo' and 'bar', not 'dbar');
    * ``* ? {`` quantifiers make the preceding char optional → drop it from
      the run (``+`` and ``{1,...}``-style minimums still require one
      occurrence, but only ``+`` is provably min>=1 without parsing the
      brace body, so ``{`` conservatively drops too; ``+`` keeps the char
      but ends the run — ``ab+c`` requires 'ab' and 'c' consecutively
      within themselves, not 'abc').

    Returns (literal, (start, end)) with the span in ``core`` coordinates
    (used for begin/end-anchor adjacency), or None when no literal of
    length >= 2 survives.  Mirrors the reference's restraint: Groonga only
    index-accelerates patterns that are plain literals
    (grn_ii_select_regexp, ii.c:6049-6117)."""
    runs: list[tuple[int, int, str]] = []
    cur: list[str] = []
    cur_start: int | None = None

    def flush(end: int) -> None:
        nonlocal cur, cur_start
        if cur_start is not None and cur:
            runs.append((cur_start, end, "".join(cur)))
        cur, cur_start = [], None

    i, n = 0, len(core)
    depth = 0
    in_class = False
    while i < n:
        c = core[i]
        if in_class:
            if c == "\\":
                i += 2
                continue
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "\\":
            flush(i)
            i += 2
            continue
        if c == "[":
            flush(i)
            in_class = True
            i += 1
            continue
        if c == "(":
            flush(i)
            depth += 1
            i += 1
            continue
        if c == ")":
            flush(i)
            depth = max(0, depth - 1)
            i += 1
            continue
        if c == "|":
            if depth == 0:
                return None  # top-level alternation: nothing is required
            i += 1
            continue
        if depth > 0:
            i += 1
            continue
        if c in "*?{":
            if cur:
                cur.pop()  # quantifier makes the preceding char optional
            flush(i - 1 if cur_start is not None else i)
            if c == "{":  # skip the brace body ({2,3} digits aren't literals)
                j = core.find("}", i + 1)
                i = (j + 1) if j >= 0 else n
            else:
                i += 1
            continue
        if c == "+":
            flush(i)  # char stays required; run ends (repetition follows)
            i += 1
            continue
        if c.isalnum() and c.isascii():
            # single char-CLASS runs only (alpha xor digit): the TokenRegexp
            # lexicon splits runs by class, so a cross-class bigram like
            # 'b1' in 'ab1' never exists in the index
            if cur and cur[-1].isdigit() != c.isdigit():
                flush(i)
            if cur_start is None:
                cur_start = i
            cur.append(c)
            i += 1
            continue
        flush(i)  # any other metachar/punct ends the run
        i += 1
    flush(n)
    best = max(runs, key=lambda r: len(r[2]), default=None)
    if best is None or len(best[2]) < 2:
        return None
    return best[2], (best[0], best[0] + len(best[2]))


def _near_count(lists: "list[list[int]]", max_iv: int) -> int:
    """Number of NEAR windows under the reference's greedy scan
    (grn_ii_select NEAR branch, ii.c:6471-6497): while every term has a
    position, if max-min <= max_interval count one occurrence and advance
    the min-term cursor past max; otherwise advance it to max-interval.
    The reference's default scorer adds (noccur + tscore) per record
    (ii.c:6531-6539) — with zero term weights the NEAR _score IS this
    count (suite/select/filter/near/*: one window → _score 1)."""
    import heapq

    lists = [sorted(l) for l in lists]
    idx = [0] * len(lists)
    if any(not l for l in lists):
        return 0
    heap = [(l[0], i) for i, l in enumerate(lists)]
    cur_max = max(v for v, _ in heap)
    heapq.heapify(heap)
    noccur = 0
    while True:
        mn, i = heap[0]
        if cur_max - mn <= max_iv:
            noccur += 1
            target = cur_max + 1
        else:
            target = cur_max - max_iv
        l = lists[i]
        j = idx[i] + 1
        while j < len(l) and l[j] < target:
            j += 1
        if j >= len(l):
            return noccur
        idx[i] = j
        heapq.heapreplace(heap, (l[j], i))
        cur_max = max(cur_max, l[j])


def _near_window(lists: list[list[int]], max_iv: int) -> bool:
    """exists (p_0..p_m), p_i in lists[i], max-min <= max_iv."""
    import heapq

    iters = [iter(sorted(l)) for l in lists]
    heap = []
    cur_max = None
    for i, it in enumerate(iters):
        v = next(it, None)
        if v is None:
            return False
        heap.append((v, i))
        cur_max = v if cur_max is None else max(cur_max, v)
    heapq.heapify(heap)
    while True:
        mn, i = heap[0]
        if cur_max - mn <= max_iv:
            return True
        v = next(iters[i], None)
        if v is None:
            return False
        heapq.heapreplace(heap, (v, i))
        cur_max = max(cur_max, v)
