"""Dataset maintenance: small-file compaction.

Streaming sinks, incremental ingests, and per-batch partitions all leak
small parquet files; at 100 TB the file count (not the byte count)
becomes the scan-planning and namenode/liststatus bottleneck.  This is
the compaction job every production table needs on a schedule.

Design: size the output file count from the dataset's actual bytes
(``target_file_mb``), rewrite with ``coalesce`` (no shuffle — merging
files needs no repartition unless a layout sort is requested), and
promote atomically through the blue/green staging swap so readers never
see a half-compacted table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def dataset_file_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) for the parquet files under ``path``."""
    n = size = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                size += os.path.getsize(os.path.join(root, f))
    return n, size


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` (in place, via staging + atomic rename) with
    files sized toward ``target_file_mb``.

    ``sort_cols`` optionally applies a layout sort within each output
    file (sortWithinPartitions — improves parquet min/max row-group
    skipping for range predicates on those columns; costs a local sort,
    still no shuffle).

    Returns {"files_before", "files_after", "bytes"} for audit logs.
    """
    n_before, total_bytes = dataset_file_stats(path)
    target = max(1, total_bytes // (target_file_mb * 1024 * 1024) + 1)
    df: DataFrame = spark.read.parquet(path)
    out = df.coalesce(int(target))
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    staging = path + ".compact-staging"
    out.write.mode("overwrite").parquet(staging)
    old = path + ".compact-old"
    if os.path.isdir(old):
        import shutil

        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(staging, path)
    import shutil

    shutil.rmtree(old)
    n_after, _ = dataset_file_stats(path)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes": total_bytes,
    }
