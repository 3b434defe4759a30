"""Training-sequence packing: assign documents to fixed-size context
windows (the concatenate-then-chunk layout GPT-style pre-training uses).

Documents are laid out in a deterministic order (doc_id) within each
source stream; a running token total places every document at an
absolute offset, from which its context-window id and in-window offset
follow arithmetically.  Everything is one window function over
(source, doc_id) — a single shuffle on ``source``, no driver state, and
the assignment is a pure function of the input (stable under
repartitioning, unlike any accumulate-in-a-loop packer).

Scale note: parallelism is bounded by the number of sources; at 100 TB
shard each source into ``salt = pmod(hash(doc_id), k)`` sub-streams
first (documented here, not needed at fixture scale — the window spec
stays identical with ``partitionBy(source, salt)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from puma_matcher_spark.llmdata.textstats import tokens


def sequence_packing(
    docs: DataFrame, ctx_len: int = 512, text_col: str = "text"
) -> DataFrame:
    """Per-document packing assignment: (doc_id, source, n_tokens,
    pack_id, pack_offset, n_packs_spanned).

    ``pack_id`` is the context window the document STARTS in,
    ``pack_offset`` its token offset inside that window, and
    ``n_packs_spanned`` how many windows it crosses (documents longer
    than the remaining window space wrap — chunking semantics, no
    padding waste).
    """
    w = Window.partitionBy("source").orderBy("doc_id")
    n_tok = F.size(tokens(F.lower(F.col(text_col))))
    out = docs.select(
        "doc_id", "source", n_tok.cast("long").alias("n_tokens")
    ).withColumn("_end", F.sum("n_tokens").over(w))
    start = F.col("_end") - F.col("n_tokens")
    return out.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(start / ctx_len).cast("long").alias("pack_id"),
        (start % ctx_len).cast("long").alias("pack_offset"),
        (
            F.floor((F.col("_end") - 1) / ctx_len) - F.floor(start / ctx_len) + 1
        ).cast("long").alias("n_packs_spanned"),
    )
