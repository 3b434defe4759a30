"""Match editors — post-scoring score overrides.

Reference: the pipeline's Editor stage applies per-type overrides after
normalisation (FullMatcherApp pipeline wiring :166-190); the
HundredMatchEditor forces the score of "certain" matches (equal DOI /
proposal code) to the maximum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hundred_match_editor(
    candidates: DataFrame, certain_types: list[str], score: float = 100.0
) -> DataFrame:
    """Force the score of certain-match types to ``score``."""
    types = F.array(*[F.lit(t) for t in certain_types])
    return candidates.withColumn(
        "score",
        F.when(F.array_contains(types, F.col("score_type")), F.lit(score)).otherwise(
            F.col("score")
        ),
    )


def score_override_editor(
    candidates: DataFrame, overrides: DataFrame
) -> DataFrame:
    """Apply per-pair score overrides from an edits table
    (pair_id, score_type, new_score); unedited rows pass through."""
    o = overrides.select(
        "pair_id", "score_type", F.col("new_score").alias("_new")
    )
    return (
        candidates.join(F.broadcast(o), ["pair_id", "score_type"], "left")
        .withColumn("score", F.coalesce("_new", "score"))
        .drop("_new")
    )
