"""SparkSession factory with the engine's tuned configuration.

Mirrors the intent of the reference's ``ProgramConfig.defaultSparkConfig``
(reference: utils/conf/ProgramConfig.scala:102-123) — shuffle-partition
sizing, Kryo, object-hash-aggregate fallback for heavy ``collect_list`` —
re-expressed for Spark 3.5+/4.x: AQE replaces most manual repartitioning,
auto-broadcast replaces most explicit hints.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "puma-matcher-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    On a real cluster the same conf applies; only ``master`` changes.  AQE
    is load-bearing at scale: it coalesces small shuffle partitions, turns
    sort-merge joins into broadcast joins when the runtime size allows, and
    splits skewed partitions (the reference guarded skew manually with
    frequency caps — we keep those too, see operators.matcher).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1024")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # planner filter pushdown into Python data sources (Spark 4.1;
        # the manifest_text source prunes files on pushed predicates)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # NOTE: ignoreCorruptFiles stays at its default (false) on purpose.
        # For a training-data engine, silently dropping unreadable inputs
        # is data loss masquerading as success — at 100 TB a corrupt
        # shard must fail the job loudly, not vanish from the corpus.
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no nanos type —
        # read as long and convert (sources.testdata.Tables.events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # single-JVM local mode: driver heap IS the executor heap; 16g on
        # the 128 GiB box keeps GC out of the bench numbers
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
