"""Blue/green dataset publishing (schema-swap rebuild).

Reference: results are written into a *start* schema and atomically
swapped with the live schema via three ``ALTER SCHEMA ... RENAME``
statements, only when the run had no errors (DbManager.swapSchema,
utils/database/DbManager.scala:636-648; invoked FullMatcherApp.scala:56-62).

Parquet twin: write to ``<root>/staging``, then rotate
live → old → staging → live with directory renames (atomic on a posix
filesystem / same-bucket object-store rename).  Readers resolve through
``<root>/live`` so they never observe a half-written dataset.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_staging(df: DataFrame, root: str) -> str:
    staging = os.path.join(root, "staging")
    df.write.mode("overwrite").parquet(staging)
    return staging


def swap_live(root: str) -> None:
    """Atomic promotion: live → old (dropped), staging → live."""
    staging = os.path.join(root, "staging")
    live = os.path.join(root, "live")
    old = os.path.join(root, "old")
    if not os.path.isdir(staging):
        raise FileNotFoundError(f"no staging dataset at {staging}")
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(live):
        os.rename(live, old)
    os.rename(staging, live)


def publish(df: DataFrame, root: str) -> None:
    """write_staging + swap_live — the no-error path of the reference's
    swap; on exception nothing is promoted (FullMatcherApp.scala:56-62)."""
    write_staging(df, root)
    swap_live(root)


def read_live(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "live"))
