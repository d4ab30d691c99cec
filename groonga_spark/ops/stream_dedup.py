"""Streaming exact deduplication — a custom STATEFUL operator on
Structured Streaming via ``applyInPandasWithState``.

Batch dedup (ops/dedup.py) sees the whole corpus at once; a streaming
ingest pipeline must remember which documents it has already admitted
ACROSS micro-batches.  The Spark-native shape is keyed state:

    readStream → fp = md5(text) → groupBy(fp).applyInPandasWithState

Per fingerprint, the state records the first admitted doc id; the first
arrival passes through (within a batch, the smallest id wins — arrival
order inside a micro-batch carries no guarantee), every later arrival of
the same fingerprint is dropped.  State lives in Spark's state store,
hash-partitioned by fingerprint across executors and checkpointed with
the query — at cluster scale the seen-set never sits on one node and the
query resumes exactly-once after restart (no Python-side bookkeeping).

The reference has no stream semantics (its index is online-updatable per
record, lib/ii.c:5120); this operator is part of the LLM-training-data
pipeline surface, feeding :class:`~groonga_spark.streaming.
StreamingIndexMaintainer` deduplicated documents.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    changes: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Streaming (id, text) → streaming (fp, id, text) with cross-batch
    exact dedup: one surviving row per distinct ``text`` for the lifetime
    of the query (state store persists across restarts via checkpoint)."""
    out_schema = f"fp string, {id_col} long, {text_col} string"
    state_schema = "first_id long"

    def _dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # fingerprint admitted in an earlier micro-batch → drop all
            return
        best_id, best_text = None, None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            i = pdf[id_col].idxmin()
            if best_id is None or pdf[id_col][i] < best_id:
                best_id, best_text = int(pdf[id_col][i]), pdf[text_col][i]
        if best_id is None:
            return
        state.update((best_id,))
        yield pd.DataFrame({"fp": [key[0]], id_col: [best_id], text_col: [best_text]})

    with_fp = changes.withColumn("fp", F.md5(F.col(text_col)))
    return with_fp.groupBy("fp").applyInPandasWithState(
        _dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
