"""Change-data-capture operators: latest-state apply and SCD type-2
history building.

Additive to the reference (SURVEY.md §2.12) — a 100 TB pipeline that
ingests upstream changelogs (Debezium-style I/U/D streams) needs two
canonical materialisations:

* :func:`cdc_latest_state` — collapse a changelog to the current row
  per key (newest change wins; a terminal delete removes the key).
  One ``row_number`` window partitioned by the key — the shuffle is on
  the key, exactly the partitioning the downstream merge needs.
* :func:`scd2_history` — rebuild the slowly-changing-dimension type-2
  version table from the same changelog: one row per (key, attribute
  run), with validity bounds and an ``is_current`` flag.  A lag()
  dedups consecutive identical attribute values, a lead() closes each
  version — two windows over ONE shuffle (same partitioning + ordering,
  Spark reuses the sort).

Both use a total order of ``(ts, seq)`` so replays and ties are
deterministic.  Validity bounds are exposed as epoch seconds (BIGINT)
— engine-portable, no timestamp-zone ambiguity in the hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cdc_latest_state(
    changes: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    seq: str = "event_id",
    delete_when=None,
) -> DataFrame:
    """Newest-change-wins state: keep the last change per key, drop keys
    whose last change is a delete.

    ``delete_when`` is a Column predicate marking delete records
    (default: ``event_type == 'error'`` for the events fixture).
    """
    if delete_when is None:
        delete_when = F.col("event_type") == "error"
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col(seq).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(~delete_when)
        .drop("_rn")
    )


def scd2_history(
    changes: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    seq: str = "event_id",
    attr: str = "event_type",
) -> DataFrame:
    """SCD2 version table: one row per run of equal ``attr`` values per
    key, ordered by (ts, seq).

    Consecutive duplicate values collapse into the earlier version
    (standard changelog compaction); each version's ``valid_to_epoch``
    is the next version's start, NULL on the current one.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(seq).asc())
    opens = (
        changes.withColumn("_prev", F.lag(attr).over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr)))
        .select(
            F.col(key),
            F.col(attr),
            F.unix_timestamp(ts).cast("long").alias("valid_from_epoch"),
            F.col(seq).alias("_seq"),
        )
    )
    w2 = Window.partitionBy(key).orderBy(
        F.col("valid_from_epoch").asc(), F.col("_seq").asc()
    )
    return opens.select(
        key,
        attr,
        "valid_from_epoch",
        F.lead("valid_from_epoch").over(w2).alias("valid_to_epoch"),
        F.lead("valid_from_epoch").over(w2).isNull().alias("is_current"),
    )
