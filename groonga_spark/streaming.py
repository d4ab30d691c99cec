"""Structured-Streaming maintenance of a persisted inverted index.

The reference keeps its index online-updatable per record
(``grn_ii_column_update``, lib/ii.c:5120) but has no stream semantics.  The
Spark-native shape of "documents keep arriving and the index stays fresh"
is micro-batched exactly-once maintenance:

    readStream (upserts/deletes) → foreachBatch → segment-algebra update
    (index/update.py: only affected terms' postings are re-encoded) →
    atomic snapshot swap

Each micro-batch is applied with the same rank-identity guarantee the batch
updater has: after every batch, queries against the index are identical to
a full rebuild over the current document set.

Exactly-once: the sink records the last applied ``batchId`` in the index
manifest and skips replayed batches (the standard idempotent-foreachBatch
contract).  Each batch writes into fresh VERSIONED directories
(``docs_v<N>`` / ``index_v<N>``) and the atomic ``state.json`` replace is
the single commit point naming the live version — a crash at ANY point
before it leaves the previous version's directories untouched, so the
replayed batch reads consistent (docs, index) state.  (The r1 layout
rm-renamed ``docs`` then ``index`` as two steps; a crash between them left
docs=new against index=old, and the replay's delta would corrupt
dictionary df/cf.)  Stale version directories are removed only AFTER
commit.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index.build import InvertedIndex, build_index
from .index.checkpoint import read_index, write_index
from .index.update import apply_update

_OP_COL = "_op"  # optional: "upsert" (default) | "delete"


class StreamingIndexMaintainer:
    """Owns ``root/`` = {``docs/`` parquet snapshot, ``index/`` persisted
    index, ``state.json``}.  Feed it a streaming DataFrame of document
    changes via :meth:`sink`; query through :meth:`load_index` any time."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        text_cols: list[str],
        tokenizer: str = "bigram",
        id_col: str = "doc_id",
    ):
        self.spark = spark
        self.root = root
        self.text_cols = text_cols
        self.tokenizer = tokenizer
        self.id_col = id_col
        os.makedirs(root, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _p(self, *parts: str) -> str:
        return os.path.join(self.root, *parts)

    def _state(self) -> dict:
        try:
            with open(self._p("state.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"last_batch_id": -1, "initialized": False, "version": 0}

    def _save_state(self, st: dict) -> None:
        tmp = self._p("state.json.tmp")
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self._p("state.json"))

    # -- public surface ----------------------------------------------------
    def _live(self, kind: str) -> str:
        ver = self._state().get("version", 0)
        return self._p(f"{kind}_v{ver}")

    def load_index(self) -> InvertedIndex:
        return read_index(self.spark, self._live("index"))

    def load_docs(self) -> DataFrame:
        return self.spark.read.parquet(self._live("docs"))

    def sink(self, changes: DataFrame, checkpoint: str | None = None, **trigger_kw):
        """Attach as a streaming sink: ``changes`` is a streaming DataFrame
        with (id_col, *text_cols[, _op]).  Returns the StreamingQuery."""
        return (
            changes.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint or self._p("_checkpoint"))
            .outputMode("update")
            .start(**trigger_kw)
        )

    # -- the micro-batch applier (also usable directly for batch tests) ----
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        st = self._state()
        if batch_id <= st["last_batch_id"]:
            return  # replayed batch — idempotent skip
        cols = [self.id_col, *self.text_cols]
        if _OP_COL in batch.columns:
            deletes = batch.filter(F.col(_OP_COL) == "delete").select(self.id_col)
            upserts = batch.filter(F.col(_OP_COL) != "delete").select(*cols)
        else:
            deletes = batch.limit(0).select(self.id_col)
            upserts = batch.select(*cols)
        # one row per id inside a micro-batch (arrival order within a batch
        # carries no ordering guarantee; upstream must emit one final state
        # per id per batch for deterministic results)
        upserts = upserts.dropDuplicates([self.id_col])

        old_ver = st.get("version", 0)
        new_ver = old_ver + 1
        docs_new = self._p(f"docs_v{new_ver}")
        index_new = self._p(f"index_v{new_ver}")

        if not st["initialized"]:
            docs = upserts.join(deletes, self.id_col, "left_anti")
            docs.write.mode("overwrite").parquet(docs_new)
            docs = self.spark.read.parquet(docs_new)
            idx = build_index(docs, self.text_cols, self.tokenizer, self.id_col)
            write_index(idx, index_new)
        else:
            snapshot = self.load_docs()
            idx = self.load_index()
            changed_ids = upserts.select(self.id_col).unionByName(deletes).distinct()
            old_docs = snapshot.join(changed_ids, self.id_col, "left_semi").select(*cols)
            # apply_update semantics: old-only = delete, new-only = insert
            new_idx = apply_update(idx, old_docs, upserts, id_col=self.id_col)
            write_index(new_idx, index_new)
            docs = (
                snapshot.join(changed_ids, self.id_col, "left_anti")
                .select(*cols)
                .unionByName(upserts)
            )
            docs.write.mode("overwrite").parquet(docs_new)

        # COMMIT: the atomic state.json replace flips the live version.
        # Any crash before this line leaves version old_ver fully intact
        # (the half-written _v{new_ver} dirs are overwritten on replay).
        self._save_state(
            {"last_batch_id": batch_id, "initialized": True, "version": new_ver}
        )
        # cleanup AFTER commit: previous version + any stale strays
        for name in os.listdir(self.root):
            for kind in ("docs_v", "index_v"):
                if name.startswith(kind) and name != f"{kind}{new_ver}":
                    shutil.rmtree(self._p(name), ignore_errors=True)
