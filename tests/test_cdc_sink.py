"""Stream/batch equivalence for the CDC upsert sink: draining the events
changelog through foreachBatch micro-batches must land the same snapshot
as the one-shot batch operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from puma_matcher_spark.operators.cdc import cdc_latest_state
from puma_matcher_spark.sources.testdata import load_tables
from puma_matcher_spark.streaming.cdc_sink import (
    read_current,
    start_cdc_upsert,
    upsert_batch,
)
from puma_matcher_spark.streaming.events import read_events_stream


def test_stream_upsert_matches_batch_cdc(spark, sf_small, tmp_path):
    root = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_small)
    q = start_cdc_upsert(stream, root, ckpt)
    q.awaitTermination(120)

    got = read_current(spark, root).select(
        "user_id", "event_id", "event_type"
    )
    want = cdc_latest_state(load_tables(spark, sf_small).events()).select(
        "user_id", "event_id", "event_type"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_upsert_batch_replay_is_idempotent(spark):
    batch = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "view", 1.0),
            (2, "2024-01-01 00:01:00", 1, "click", 2.0),
        ],
        "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    once = upsert_batch(None, batch)
    twice = upsert_batch(once, batch)  # replay of the same batch
    assert twice.count() == 1
    assert twice.first()["event_id"] == 2
