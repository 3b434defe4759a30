"""Deterministic corpus sampling / splitting for training pipelines.

Hash-bucket assignment (portable md5 arithmetic) instead of
``DataFrame.sample``: the assignment is a pure function of the row key,
so it is identical across engines, runs, partitionings and cluster
sizes — the reproducibility property a train/val/test split must have.
``sample()`` with a seed is NOT stable across repartitioning, which at
100 TB means a resized cluster silently reshuffles the held-out set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from puma_matcher_spark.llmdata.dedup import portable_hash60


def hash_bucket(key, n_buckets: int = 100):
    """Stable bucket 0..n_buckets-1 from the row key (column or name)."""
    c = F.col(key) if isinstance(key, str) else key
    return portable_hash60(c.cast("string")) % n_buckets


def with_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign train/val/test split labels by hash bucket."""
    b = hash_bucket(id_col)
    return docs.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def hash_sample(docs: DataFrame, pct: int, key: str = "doc_id") -> DataFrame:
    """Keep a deterministic pct% sample (same rows every run/engine)."""
    return docs.where(hash_bucket(key) < pct)
