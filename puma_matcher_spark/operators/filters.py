"""Candidate-pair filters (P2–P7).

Each is a pure ``DataFrame -> DataFrame`` over MATCH_PAIR/MATCH_CANDIDATE
rows.  The document dims joined here are one row per document — they grow
linearly with the corpus, so unlike the reference (which broadcasts
explicitly at filter/TypeFilter.scala:26 for its bounded ILL corpus) no
forced broadcast hints are used: AQE broadcasts when the runtime size
allows and shuffle-joins on the document key when it doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim_both_sides(
    pairs: DataFrame, dim: DataFrame, value_col: str, out1: str, out2: str
) -> DataFrame:
    """Join a (document_version_id, value) dim to both pair sides."""
    d1 = dim.select(
        F.col("document_version_id").alias("document_version1_id"),
        F.col(value_col).alias(out1),
    )
    d2 = dim.select(
        F.col("document_version_id").alias("document_version2_id"),
        F.col(value_col).alias(out2),
    )
    return pairs.join(d1, "document_version1_id").join(
        d2, "document_version2_id"
    )


def type_filter(pairs: DataFrame, documents: DataFrame) -> DataFrame:
    """Keep only PROPOSAL↔non-PROPOSAL pairs (P2).

    filter/TypeFilter.scala:23-45: two broadcast joins to the doc-type dim,
    then XOR on ``startsWith('PROPOSAL')``, helper columns dropped.
    """
    dim = documents.select("document_version_id", "document_type")
    joined = _dim_both_sides(pairs, dim, "document_type", "_t1", "_t2")
    return joined.where(
        F.col("_t1").startswith("PROPOSAL") != F.col("_t2").startswith("PROPOSAL")
    ).drop("_t1", "_t2")


def date_filter(pairs: DataFrame, documents: DataFrame) -> DataFrame:
    """Proposal must predate (or tie) the publication, by year (P3).

    filter/DateFilter.scala:27-75.  The reference null-fills dates with
    1900-01-01 then compares years in a typed FilterFunction; here it is a
    pure ``year()`` column predicate (no UDF).  Pairs are canonical
    (dv1 proposal XOR dv2 proposal after type_filter), so the predicate is
    written symmetrically: year of the proposal side <= year of the
    publication side.
    """
    dim = documents.select(
        "document_version_id",
        F.coalesce(F.col("date"), F.lit("1900-01-01").cast("timestamp")).alias("date"),
        "document_type",
    )
    d1 = dim.select(
        F.col("document_version_id").alias("document_version1_id"),
        F.col("date").alias("_d1"),
        F.col("document_type").alias("_t1"),
    )
    d2 = dim.select(
        F.col("document_version_id").alias("document_version2_id"),
        F.col("date").alias("_d2"),
        F.col("document_type").alias("_t2"),
    )
    joined = pairs.join(d1, "document_version1_id").join(
        d2, "document_version2_id"
    )
    prop_year = F.when(F.col("_t1").startswith("PROPOSAL"), F.year("_d1")).otherwise(
        F.year("_d2")
    )
    pub_year = F.when(F.col("_t1").startswith("PROPOSAL"), F.year("_d2")).otherwise(
        F.year("_d1")
    )
    return joined.where(prop_year <= pub_year).drop("_d1", "_d2", "_t1", "_t2")


def document_version_id_filter(pairs: DataFrame, valid_docs: DataFrame) -> DataFrame:
    """Drop pairs touching obsolete documents (P4).

    filter/DocumentVersionIdFilter.scala:22-35 — the reference inner-joins
    and drops; ``left_semi`` expresses the intent without carrying columns.
    """
    v1 = valid_docs.select(
        F.col("document_version_id").alias("document_version1_id")
    )
    v2 = valid_docs.select(
        F.col("document_version_id").alias("document_version2_id")
    )
    return pairs.join(v1, "document_version1_id", "left_semi").join(
        v2, "document_version2_id", "left_semi"
    )


def multiple_type_match_filter(
    candidates: DataFrame, allowed_single_types: list[str]
) -> DataFrame:
    """Keep pairs matched by >1 score type, or by an allowed single type (P5).

    filter/MultipleTypeMatchFilter.scala:23-41 groupBys to collect score
    types then inner-joins back.  Rebuilt as a window aggregate —
    ``collect_set(score_type) over (partition by pair)`` — one shuffle on
    the pair key instead of the reference's aggregate + join (two passes
    over the fact table).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("document_version1_id", "document_version2_id")
    allowed = F.array(*[F.lit(t) for t in allowed_single_types])
    with_types = candidates.withColumn(
        "_types", F.collect_set("score_type").over(w)
    )
    keep = (F.size("_types") > 1) | (
        F.size(F.array_intersect(F.col("_types"), allowed)) > 0
    )
    return with_types.where(keep).drop("_types")


def date_document_type_filter(
    documents: DataFrame, start_year: int, end_year: int
) -> DataFrame:
    """Restrict publications to a year range (P6).

    filter/DateDocumentTypeFilter.scala:24-35.  The reference has a latent
    bug (``year($"date" >= lit(startYear) && ...)`` — comparison inside
    ``year``); rebuilt with the intended semantics.
    """
    return documents.where(
        (~F.col("document_type").startswith("PUBLICATION"))
        | F.year("date").between(start_year, end_year)
    )
