"""Skew-mitigation helpers: key salting and bucketed co-location.

The reference's skew strategy is *semantic* frequency capping (SURVEY.md
§4 "skew/explosion mitigation" — drop hot entities).  Where dropping is
not acceptable, these helpers provide the mechanical alternatives:

* ``salted_join`` — N-way salting of a skewed equi-join: the skewed side
  gets a random salt in [0, N), the other side is replicated N× with all
  salts; the join key becomes (key, salt), splitting each hot key across
  N reducers.  AQE's skew-join handles moderate skew automatically
  (enabled in session.py); salting is for the pathological keys AQE can't
  split (single-key hash aggregation hot spots).
* ``write_bucketed`` / ``read_bucketed`` — persist a fact table bucketed
  by its join key so repeated joins/aggregations on that key run with no
  Exchange at all (Spark reads bucket metadata and plans a local join).
  This is the 100 TB answer for the candidate-pair tables that every
  downstream stage re-joins on pair_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def spread_input(df: DataFrame) -> DataFrame:
    """Raise scan parallelism for heavy map-side expression work.

    Map-side operators (shingling, fingerprinting) pipeline their heavy
    expressions with the scan, so their parallelism equals the input
    split count.  A 100 TB corpus has thousands of splits (this becomes
    a no-op); small single-row-group fixtures would run serially — when
    the scan has materially fewer splits than the session's shuffle
    parallelism, round-robin repartition the (cheap, pre-explode) rows.
    """
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        if df.rdd.getNumPartitions() >= max(2, target // 2):
            return df
    except Exception:
        return df
    return df.repartition(target)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side replicated."""
    s = skewed.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return s.join(o, [on, "_salt"], how).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase sum aggregation for a hot grouping key: partial sums on
    (key, salt), final sum on key.  Map-side combine already does this
    for most aggregates — explicit salting matters for object hash
    aggregates (collect_list) where partials can't combine."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.sum(agg_col).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(f"sum_{agg_col}"))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist bucketed by the join key (saveAsTable — bucket metadata
    lives in the session catalog/warehouse)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def key_skew_report(df: DataFrame, key: str, top_n: int = 20) -> DataFrame:
    """Pre-join skew diagnostic: the ``top_n`` heaviest values of ``key``
    with their row share and the share of the single heaviest key — the
    numbers that decide between a plain shuffle join, salting, or a
    frequency cap (the reference hard-codes caps like 2000 docs/entity;
    this measures what the cap should be).

    One partial-aggregated count + TakeOrdered; the total folds in as a
    scalar subquery, so the report is one job regardless of input size.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = counts.agg(F.sum("n").cast("double").alias("t")).scalar()
    order = [F.col("n").desc(), F.col(key).asc()]
    return (
        counts.orderBy(*order)
        .limit(top_n)
        .select(
            F.row_number().over(Window.orderBy(*order)).alias("skew_rank"),
            F.col(key).alias("key_value"),
            "n",
            (F.col("n") / total).alias("row_share"),
        )
    )
