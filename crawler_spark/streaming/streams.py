"""Structured Streaming surface (SURVEY §2.9).

The crawl loop itself is driven by CrawlScheduler's sequential snapshot
commits (pop-visibility forces it — §3.2); these jobs cover the
reference's *streaming-shaped* semantics with real Structured Streaming
primitives for continuously-arriving data:

  * T1 trigger cadence      -> micro-batch triggers (availableNow in tests)
  * T2 watermark            -> withWatermark + windowed aggregation
  * T3 stateful dedup       -> applyInPandasWithState URL-seen stream
  * T5 late-data policy     -> watermark drops late events

All sources are file streams over parquet (the testdata tables), sinks
are memory/noop — swap for Kafka/files in production via options.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-stream source over a directory of event parquet files (one
    file per trigger — maxFilesPerTrigger bounds batch size like the
    reference's queue pop). Use stage_events_dir to stream the testdata
    single-file table."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def stage_events_dir(sf_dir: str, target_dir: str) -> str:
    """Streaming file sources require a DIRECTORY; symlink the testdata
    single-file events table into one."""
    import os

    os.makedirs(target_dir, exist_ok=True)
    dst = os.path.join(target_dir, "events-000.parquet")
    if not os.path.exists(dst):
        os.symlink(os.path.join(sf_dir, "events.parquet"), dst)
    return target_dir


def windowed_counts(events: DataFrame, window: str = "1 day", watermark: str = "2 days") -> DataFrame:
    """T2/T5: watermarked tumbling-window counts per event_type — the
    daily-metrics rollup (ref views/subscribers snapshots) as a streaming
    aggregation; events later than the watermark are dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_DEDUP_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("first_event_id", LongType()),
    StructField("n_new", LongType()),
])

_DEDUP_STATE = StructType([StructField("seen_n", LongType())])


def stateful_first_seen(events: DataFrame) -> DataFrame:
    """T3: stateful URL-seen dedup as a stream — emit each key the first
    time it appears, keep a per-key counter in state across micro-batches
    (applyInPandasWithState; the streaming twin of operators.seen)."""

    def _fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        total = 0
        first_id = None
        for pdf in pdfs:
            total += len(pdf)
            if first_id is None and len(pdf):
                first_id = int(pdf["event_id"].min())
        out = []
        if n == 0 and total > 0:
            out.append({"user_id": key[0], "first_event_id": first_id, "n_new": total})
        state.update((n + total,))
        yield pd.DataFrame(out, columns=["user_id", "first_event_id", "n_new"])

    return events.groupBy("user_id").applyInPandasWithState(
        _fn, _DEDUP_OUT, _DEDUP_STATE, "append", GroupStateTimeout.NoTimeout
    )


def host_depth_counts(events: DataFrame) -> DataFrame:
    """The streaming twin of host_depth_histogram's stateful half:
    running per-host queue-depth counts over a continuously-arriving
    event/frontier stream — the live feed for the skew monitor and the
    adaptive pop caps (frontier.pop(adaptive=True)). One stateful
    aggregation keyed (event_type, user_id), drained in complete mode;
    the decade rollup is STATELESS over this host-sized output
    (queries_scale.decade_rollup — the single shared definition), kept
    outside the stream because chained streaming aggregations are
    unsupported and the rollup input is one row per host anyway."""
    return events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )


def run_to_memory(df: DataFrame, name: str, checkpoint_dir: str, mode: str | None = None):
    """Drain all available input (availableNow trigger) into a memory
    sink; returns after the stream completes — deterministic for tests.
    `mode` defaults to append for stateful-map outputs and complete for
    aggregations."""
    if mode is None:
        mode = "complete" if "sum_value" in df.columns else "append"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


_RATE_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
])

_RATE_STATE = StructType([StructField("used", LongType())])


def stateful_rate_limit(events: DataFrame, k: int = 5) -> DataFrame:
    """T4: stateful per-key rate limiting as a stream — admit at most k
    events per key over the stream's lifetime, carrying the used count
    in state across micro-batches (the streaming twin of the politeness
    token table; ref apikeys quota, src/repos/apikeys_repo.rs:39-67).
    Deterministic: events admit in event_id order within each batch."""

    def _fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        used = state.get[0] if state.exists else 0
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["event_id"])
        ids.sort()
        admit = ids[: max(0, k - used)]
        state.update((used + len(ids),))
        yield pd.DataFrame(
            [{"user_id": key[0], "event_id": e} for e in admit],
            columns=["user_id", "event_id"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _fn, _RATE_OUT, _RATE_STATE, "append", GroupStateTimeout.NoTimeout
    )
