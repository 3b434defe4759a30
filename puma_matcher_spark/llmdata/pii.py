"""PII detection and scrubbing for training-data curation.

Regex-only (patterns chosen to behave identically under Java regex and
RE2 — no backreferences or lookarounds), so detection counts and
redaction run map-side in whole-stage codegen: no UDF, no shuffle,
linear at any corpus size.  The standard pre-training hygiene pass:
count hits per class for audit, replace with typed placeholder tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# class → (pattern, replacement token); order matters — emails before
# phones so the digits inside an address are not double-matched
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9 ()-]{7,}[0-9]", "<PHONE>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
)


def with_pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts (audit pass before scrubbing)."""
    cols = [F.col("doc_id")]
    for name, pattern, _ in PII_PATTERNS:
        cols.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
    return docs.select(*cols)


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII hit with its typed placeholder token."""
    scrubbed = F.col(text_col)
    for _, pattern, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    return docs.withColumn("scrubbed_text", scrubbed)
