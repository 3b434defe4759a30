"""Pair scoring — TF-IDF roll-up with the reference's "team factor".

Reference: scorer/EntitiesScorer.scala:39-67 (A3/A4):

* idf(entity) = log10(doc_count / df(entity))      (EntitiesMatcherV2.scala:73)
* per-(pair, entity) contribution = (tf1 + tf2) * idf
* team factor: pairs sharing many of their entities get boosted —
  ``score = Σ contribution * (1 + k * common * (0.5/n1 + 0.5/n2))`` with
  k = scoreFactor = 3 (config), common = #shared entities, n1/n2 = per-doc
  distinct entity counts (EntitiesScorer.scala:42,55-56).

Spark shape: two chained hash aggregates on the pair key — partial
aggregation happens map-side, so the shuffle carries one row per
(pair, entity) then one per pair.  The doc-count scalar is computed once
and folded in as a literal (driver scalar, not a cross join).  The idf
and per-doc count frames grow with the corpus, so they carry no forced
broadcast hints — AQE chooses broadcast vs shuffle from runtime sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from puma_matcher_spark.functions.ids import candidate_id, pair_id
from puma_matcher_spark.operators.matcher import doc_entity_counts, entity_doc_frequency

DEFAULT_SCORE_FACTOR = 3.0


def with_idf(pairs: DataFrame, tf: DataFrame, doc_count: int | Column) -> DataFrame:
    """Attach idf = log10(N/df) per entity to pair co-occurrence rows.

    ``doc_count`` may be an int or a Column — pass a scalar-subquery
    column (``df.scalar()``) to fold N into the plan instead of paying an
    eager plan-build-time corpus scan."""
    n = (
        doc_count.cast("double")
        if isinstance(doc_count, Column)
        else F.lit(float(doc_count))
    )
    idf = entity_doc_frequency(tf).withColumn("idf", F.log10(n / F.col("df")))
    # idf is one row per distinct entity — the entity dictionary grows with
    # the corpus, so no explicit broadcast hint: AQE broadcasts when the
    # runtime size allows and shuffle-joins on entity_id when it doesn't.
    return pairs.join(idf.select("entity_id", "idf"), "entity_id")


def score_entity_pairs(
    pairs_with_idf: DataFrame,
    tf: DataFrame,
    score_type: str,
    type_id: int,
    score_factor: float = DEFAULT_SCORE_FACTOR,
) -> DataFrame:
    """EntitiesScorer A4 roll-up → MATCH_CANDIDATE rows.

    Input ``pairs_with_idf``: one row per (pair, entity) with tf1, tf2, idf.
    """
    counts = doc_entity_counts(tf)
    per_pair = pairs_with_idf.groupBy(
        "document_version1_id", "document_version2_id"
    ).agg(
        F.sum((F.col("tf1") + F.col("tf2")) * F.col("idf")).alias("raw_score"),
        F.count(F.lit(1)).alias("common"),
        F.sum(F.col("tf1") + F.col("tf2")).alias("item_count"),
    )
    n1 = counts.select(
        F.col("document_version_id").alias("document_version1_id"),
        F.col("doc_entity_count").alias("n1"),
    )
    n2 = counts.select(
        F.col("document_version_id").alias("document_version2_id"),
        F.col("doc_entity_count").alias("n2"),
    )
    # n1/n2 are per-document frames (corpus-sized) — no broadcast hint,
    # AQE picks the strategy from runtime sizes.
    scored = (
        per_pair.join(n1, "document_version1_id")
        .join(n2, "document_version2_id")
        .withColumn(
            "score",
            F.col("raw_score")
            * (
                F.lit(1.0)
                + F.lit(score_factor)
                * F.col("common")
                * (0.5 / F.col("n1") + 0.5 / F.col("n2"))
            ),
        )
    )
    return scored.select(
        candidate_id(
            F.col("document_version1_id"), F.col("document_version2_id"), type_id
        ).alias("id"),
        "document_version1_id",
        "document_version2_id",
        F.lit(score_type).alias("score_type"),
        F.col("score").cast("double").alias("score"),
        F.col("item_count").cast("long").alias("item_count"),
        pair_id(
            F.col("document_version1_id"), F.col("document_version2_id")
        ).alias("pair_id"),
    )
