"""Streaming-driven crawl loop: the scheduler's micro-batches fired by a
Structured Streaming trigger (SURVEY §2.9 T1 — the reference's
`loop { work; sleep(cadence) }` producers become a rate-source stream
with foreachBatch).

foreachBatch serializes batch execution, which is exactly the
pop-visibility requirement (§3.2): batch N+1's pop reads the snapshot
batch N committed. The rate source is a clock, not data — the frontier
table remains the work queue, so a trigger with an empty/any payload
still advances the crawl by one scheduler batch.
"""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQuery

from crawler_spark.streaming.scheduler import CrawlScheduler


def start_streaming_loop(
    sched: CrawlScheduler,
    checkpoint_dir: str,
    trigger_secs: int = 1,
    max_batches: int | None = None,
) -> StreamingQuery:
    """Start the crawl as a streaming query; each trigger runs one
    scheduler micro-batch. Returns the StreamingQuery (caller stops it,
    or it self-stops after max_batches commits)."""
    sched.init()
    spark = sched.spark
    ticks = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )

    def _one_batch(_df, _batch_id):
        if max_batches is not None:
            done = int(sched.store.properties().get("batch_id", 0))
            if done >= max_batches:
                return
        sched.run_batch()

    return (
        ticks.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )


def run_streaming_loop(
    sched: CrawlScheduler,
    checkpoint_dir: str,
    n_batches: int,
    timeout_secs: float = 600.0,
) -> int:
    """Run the streaming loop until the store has committed n_batches
    crawl batches (or timeout); returns the batch count reached."""
    q = start_streaming_loop(sched, checkpoint_dir, max_batches=n_batches)
    t0 = time.monotonic()
    try:
        while time.monotonic() - t0 < timeout_secs:
            if int(sched.store.properties().get("batch_id", 0)) >= n_batches:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    return int(sched.store.properties().get("batch_id", 0))
