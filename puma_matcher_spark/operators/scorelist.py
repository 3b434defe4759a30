"""Wide per-pair score list (A12).

Reference: stage/ScoreListStage.scala:57-109 groups to
``collect_list(score_type), collect_list(score)`` then maps to one column
per known type with a Scala lookup.  Idiomatic Spark is ``pivot`` with an
explicit type list — supplying the values list up front avoids the extra
distinct-scan Spark needs to discover pivot columns, and the pivot becomes
a single hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_list(
    candidates: DataFrame,
    score_types: list[str],
    training_pairs: DataFrame | None = None,
) -> DataFrame:
    """One wide row per pair: score_<type> columns + optional accepted label.

    ``max(score)`` per cell (deterministic; the reference relies on one row
    per (pair, type) after the persister, where max == the value).
    """
    wide = (
        candidates.groupBy(
            "pair_id", "document_version1_id", "document_version2_id"
        )
        .pivot("score_type", score_types)
        .agg(F.max("score"))
    )
    for t in score_types:
        wide = wide.withColumnRenamed(t, f"score_{t}")
    if training_pairs is not None:
        labels = training_pairs.select(
            F.col("proposal_id").alias("document_version1_id"),
            F.col("publication_id").alias("document_version2_id"),
            "accepted",
        )
        wide = wide.join(
            F.broadcast(labels),
            ["document_version1_id", "document_version2_id"],
            "left",
        )
    return wide
