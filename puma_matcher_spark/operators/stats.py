"""Per-document match statistics (A7/W6) and total contextual score (A8/W2).

Reference: stage/StatisticStage.scala:67-176 mirrors the candidate table to
both documents, groups, and computes min/max/count/mean/std/median plus a
rank list in a row-wise commons-math kernel.  Rebuilt as pure SQL
aggregates — the kernel's DescriptiveStatistics quantities are exactly
Spark's ``min/max/count/avg/stddev_pop/percentile`` and the tie-sharing
rank is SQL ``RANK`` (StatisticStage.scala:105-121 reimplements RANK
semantics by hand).

stage/TotalStatisticStage.scala:58-80 (A8): contextual score = per-
publication max-normalised weighted score; ``max over (partition by
publication, score_type)`` window + weighted sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def mirror_candidates(candidates: DataFrame) -> DataFrame:
    """One row per (document, partner, score) — StatisticStage.scala:67-75
    unions the candidate table keyed by each side."""
    side1 = candidates.select(
        F.col("document_version1_id").alias("document_version_id"),
        F.col("document_version2_id").alias("partner_id"),
        "score_type",
        "score",
    )
    side2 = candidates.select(
        F.col("document_version2_id").alias("document_version_id"),
        F.col("document_version1_id").alias("partner_id"),
        "score_type",
        "score",
    )
    return side1.unionByName(side2)


def match_statistics(candidates: DataFrame) -> DataFrame:
    """Per-(document, score_type) scalar stats (A7).

    Median uses exact ``percentile`` (interpolating, matching commons-math
    DescriptiveStatistics.getPercentile(50)); swap to ``percentile_approx``
    at 100 TB.
    """
    mirrored = mirror_candidates(candidates)
    return mirrored.groupBy("document_version_id", "score_type").agg(
        F.count(F.lit(1)).cast("long").alias("match_count"),
        F.min("score").alias("score_min"),
        F.max("score").alias("score_max"),
        F.avg("score").alias("score_mean"),
        F.coalesce(F.stddev_pop("score"), F.lit(0.0)).alias("score_std"),
        F.expr("percentile(score, 0.5)").alias("score_median"),
    )


def match_ranks(candidates: DataFrame) -> DataFrame:
    """Partner ranking per document with SQL RANK tie semantics (W6)."""
    mirrored = mirror_candidates(candidates)
    w = Window.partitionBy("document_version_id", "score_type").orderBy(
        F.col("score").desc()
    )
    return mirrored.withColumn("rank", F.rank().over(w))


def total_score(candidates: DataFrame, weights: DataFrame) -> DataFrame:
    """Weighted total + contextual score per pair (A8/W2).

    ``contextual = weight * score / max(score) over (partition by
    publication, score_type) * 100``; then sum both per pair.  The
    publication side is document_version2_id by the engine's canonical
    orientation (TotalStatisticStage.scala:59-66).
    """
    w = Window.partitionBy("document_version2_id", "score_type")
    weighted = candidates.join(F.broadcast(weights), "score_type").withColumn(
        "contextual",
        F.col("weight")
        * F.col("score")
        / F.max("score").over(w)
        * F.lit(100.0),
    )
    return weighted.groupBy(
        "document_version1_id", "document_version2_id"
    ).agg(
        F.sum("score").alias("total_score"),
        F.sum("contextual").alias("total_contextual_score"),
    )
