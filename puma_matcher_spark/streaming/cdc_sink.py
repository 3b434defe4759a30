"""Streaming CDC upsert sink: maintain a newest-wins snapshot table from
a changelog stream via ``foreachBatch`` — the "materialised view over a
Debezium topic" pattern, composed from the batch CDC operator
(operators/cdc.py) so stream and batch share one semantics.

Each micro-batch:

1. reads the current snapshot (empty on first batch),
2. unions it with the batch's changes,
3. collapses to the latest change per key (``row_number`` on
   (ts, seq) — snapshot rows carry their original ordering columns, so
   replayed/late records older than the snapshot's row lose),
4. atomically replaces the snapshot via the blue/green staging swap
   (sources/publish.py) — readers never see a half-written table.

Delete handling: tombstones are RETAINED in the snapshot (a key whose
latest change is a delete keeps that row).  Dropping them at write time
would let an older replayed record resurrect the key; instead
:func:`read_current` filters tombstones at read time.  A production
deployment compacts tombstones past the replay horizon.

At scale the per-batch rewrite is the simple-and-correct baseline; the
production variant partitions the snapshot by key range and rewrites
only partitions the batch touches (same foreachBatch body, plus a
partition filter) or targets a MERGE-capable table format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from puma_matcher_spark.sources.publish import publish


def upsert_batch(
    snapshot: DataFrame | None,
    batch: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    seq: str = "event_id",
) -> DataFrame:
    """Newest-change-wins merge of one changelog batch into a snapshot.
    Pure function shared by the streaming sink and its batch twin."""
    merged = batch if snapshot is None else snapshot.unionByName(batch)
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col(seq).desc())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def read_current(
    spark: SparkSession, root: str, delete_when=None
) -> DataFrame:
    """Read the live snapshot minus delete tombstones."""
    if delete_when is None:
        delete_when = F.col("event_type") == "error"
    live = spark.read.parquet(os.path.join(root, "live"))
    # NULL predicate (e.g. null event_type) means "not a delete"
    return live.where(~F.coalesce(delete_when, F.lit(False)))


def start_cdc_upsert(
    changes: DataFrame,
    root: str,
    checkpoint: str,
    key: str = "user_id",
    ts: str = "ts",
    seq: str = "event_id",
    query_name: str = "cdc_upsert",
):
    """Attach the upsert sink to a streaming changelog and run it with
    ``availableNow`` (drain-everything) semantics; returns the query
    handle.  The checkpoint makes batch replays idempotent: a replayed
    batch re-merges the same rows and the row_number keeps the same
    winners."""
    from puma_matcher_spark.sources.maintenance import HadoopFs

    spark = changes.sparkSession
    live = os.path.join(root, "live")
    # probe through the Hadoop FS API: os.path.isdir on an HDFS/S3 live
    # path is always False, which would silently re-seed the snapshot
    # from nothing every batch (publish.py got the same r10 fix)
    fs = HadoopFs(spark, root)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        snap = None
        if fs.isdir(live):
            snap = spark.read.parquet(live).select(*batch_df.columns)
        out = upsert_batch(snap, batch_df, key, ts, seq)
        publish(out, root)

    return (
        changes.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
