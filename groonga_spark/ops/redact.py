"""PII scrubbing for training corpora: regex redaction of emails, IPv4
addresses, and long hex secrets, plus per-doc match counts.

Everything is JVM-side ``regexp_replace`` / ``regexp_extract_all`` Column
expressions — whole-stage codegen, no Python in the hot path, trivially
map-parallel at 100 TB (no shuffle; the scan's column pruning still
applies since only the text column is touched).

The patterns deliberately use only the regex subset with identical
semantics in Java (Spark) and RE2 (DuckDB) — character classes,
bounded/unbounded repetition, ``\\b`` word boundaries, no lookaround —
so the DuckDB oracle replays the redaction byte-for-byte.

Replacement order is fixed (email → ipv4 → hexkey) and each later pattern
runs on the previous pattern's OUTPUT, exactly as a real scrubber chains;
counts are taken on the ORIGINAL text per type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters and is part of the contract
PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("hexkey", r"\b[0-9a-f]{32,}\b", "<KEY>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, redacted, n_email, n_ipv4, n_hexkey) — the scrubbed text plus
    per-type match counts on the original text."""
    out = F.col(text_col)
    counts = []
    for name, pat, repl in PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        out = F.regexp_replace(out, pat, repl)
    return df.select(F.col(id_col), out.alias("redacted"), *counts)
