"""Streaming end-to-end crawl demo (SURVEY §8 round-5 candidate 4).

Drives the WHOLE engine from Structured Streaming in ONE run:

  * a file-stream TICK source (one tiny parquet per crawl tick,
    ``maxFilesPerTrigger=1`` + ``availableNow``) feeds ``foreachBatch``,
    whose callback runs ``CrawlScheduler.run_batch()`` — pop → fetch →
    decode → MERGE → discover → admit → charge → atomic snapshot commit,
    with vindex/pq/dsir sidecar upkeep on maintenance ticks;
  * before each batch, the pop's input signal (the frontier's ready
    slice at that tick's ``as_of``) is emitted as one parquet file into
    a feed directory, where a CONCURRENT streaming query — the
    ``streams.host_depth_counts`` skew feed keyed by tick label, rolled
    up through the SAME ``queries_scale.decade_rollup`` as the batch
    query — maintains a live per-tick depth histogram in a complete-mode
    memory sink while the crawl is still running.

Exactly-once across crashes WITHOUT trusting the streaming checkpoint
alone: ticks carry ``tick_id`` and the callback compares it against the
store's own persisted ``batch_id`` — a replayed epoch (crash between the
store commit and the checkpoint commit) skips ticks the snapshot store
already holds, so a resumed run converges on the identical table state
(the same contract as the snapshot store's kill/resume tests). The feed
emission is idempotent by deterministic file name: a replayed tick finds
its feed file already present and skips the write.

The streaming driver is SEMANTICS-FREE: tables after a streaming-driven
run are bit-identical to ``CrawlScheduler.run(n)`` on a twin root
(tests/test_streaming_demo.py), exactly like the WAP and MoR layers.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.operators import frontier as frontier_op
from crawler_spark.streaming import streams
from crawler_spark.streaming.scheduler import CrawlScheduler, _ts


def _tick_label(tick_id: int) -> str:
    return f"tick{tick_id:04d}"


def ready_slice(store, as_of_epoch: int) -> DataFrame:
    """The pop's input signal: frontier rows ready at as_of — the ONE
    slice definition shared by the feed writer and the equivalence
    check in the tests (frontier_op.ready, the pop's own predicate)."""
    return frontier_op.ready(store.read("frontier"), _ts(as_of_epoch))


def _write_single_parquet(df: DataFrame, dst: str) -> None:
    """Write `df` as ONE parquet file at `dst` (rename-atomic): the file
    stream source lists whole files, so a feed tick must appear all at
    once, never as a half-written part."""
    tmp = dst + ".__tmp__"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    os.replace(os.path.join(tmp, part), dst)
    shutil.rmtree(tmp, ignore_errors=True)


def _stage_ticks(spark: SparkSession, ticks_dir: str, n_batches: int) -> None:
    """One single-row parquet per crawl tick (idempotent: existing tick
    files are kept — a resumed run re-reads them through the checkpoint,
    and the batch_id guard skips the already-applied ones)."""
    os.makedirs(ticks_dir, exist_ok=True)
    for t in range(n_batches):
        dst = os.path.join(ticks_dir, f"tick-{t:04d}.parquet")
        if not os.path.exists(dst):
            _write_single_parquet(
                spark.createDataFrame([(t,)], "tick_id long"), dst
            )


def run_streaming_crawl(
    spark: SparkSession,
    root: str,
    n_batches: int,
    work_dir: str | None = None,
    sink_name: str = "demo_depth",
    feed_timeout_secs: float = 120.0,
    **sched_kwargs,
) -> dict:
    """The ONE-run demo: streaming-driven crawl + live skew feed.

    Returns crawl stats (fetched URLs/s including snapshot-commit and
    sidecar-upkeep overhead), the per-tick ready counts the feed emitted,
    and the final live rollup drained from the concurrent skew query."""
    work = work_dir or (root.rstrip("/") + "_stream")
    ticks_dir = os.path.join(work, "ticks")
    feed_dir = os.path.join(work, "feed")
    os.makedirs(feed_dir, exist_ok=True)

    sched = CrawlScheduler(spark, root, **sched_kwargs)
    sched.init()
    _stage_ticks(spark, ticks_dir, n_batches)

    # --- the live skew feed: concurrent complete-mode aggregation over
    # the feed directory, keyed by tick label (same host_depth_counts
    # stateful shape; event files appear WHILE the crawl stream runs)
    # (fresh checkpoint per invocation: the memory sink is not recovered
    # across restarts, and complete mode recomputes from the persisted
    # feed files anyway — a resumed demo re-reads the WHOLE feed)
    feed_ev = streams.events_stream(spark, feed_dir)
    skew_q = (
        streams.host_depth_counts(feed_ev)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="ckpt_feed_", dir=work),
        )
        .trigger(processingTime="1 second")
        .start()
    )

    per_batch: list[dict] = []
    tick_secs: list[float] = []  # per-tick wall (pop..commit + sidecars)
    ready_counts: dict[str, int] = {}

    def _on_tick(batch_df: DataFrame, epoch_id: int) -> None:
        ticks = sorted(r["tick_id"] for r in batch_df.select("tick_id").collect())
        for t in ticks:
            applied = int(sched.store.properties().get("batch_id", 0))
            if t < applied:
                continue  # replayed epoch: the store already holds this tick
            if t != applied:
                raise RuntimeError(
                    f"tick {t} arrived with store batch_id {applied}"
                )
            as_of = sched.t0_epoch + applied * sched.tick_secs
            label = _tick_label(t)
            feed_file = os.path.join(feed_dir, label + ".parquet")
            if not os.path.exists(feed_file):  # idempotent on replay
                slice_df = ready_slice(sched.store, as_of).select(
                    F.col("url_hash").alias("event_id"),
                    F.col("host_hash").alias("user_id"),
                    F.lit(label).alias("event_type"),
                    F.lit(_ts(as_of)).cast("timestamp").alias("ts"),
                    F.lit(0.0).alias("value"),
                    F.lit(None).cast("string").alias("props"),
                )
                _write_single_parquet(slice_df, feed_file)
            tb = time.perf_counter()
            per_batch.append(sched.run_batch())
            tick_secs.append(time.perf_counter() - tb)

    t0 = time.perf_counter()
    crawl_q = (
        spark.readStream.schema("tick_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(ticks_dir)
        .writeStream.foreachBatch(_on_tick)
        .option("checkpointLocation", os.path.join(work, "ckpt_ticks"))
        .trigger(availableNow=True)
        .start()
    )
    crawl_q.awaitTermination()
    crawl_secs = time.perf_counter() - t0

    # recount the feed from its own files (replay-safe: per_batch only
    # holds THIS run's batches, the feed dir holds every tick's)
    for f in os.listdir(feed_dir):
        if f.endswith(".parquet"):
            label = f[: -len(".parquet")]
            ready_counts[label] = spark.read.parquet(
                os.path.join(feed_dir, f)
            ).count()

    # --- drain: wait until the LIVE query has absorbed every feed file
    # (complete mode: the sink is rewritten per trigger, so totals per
    # tick label converge to the file counts exactly once all are read)
    deadline = time.monotonic() + feed_timeout_secs
    want = {k: v for k, v in ready_counts.items() if v > 0}
    while True:
        got = {
            r["event_type"]: r["n"]
            for r in spark.table(sink_name)
            .groupBy("event_type")
            .agg(F.sum("n").alias("n"))
            .collect()
        }
        if got == want:
            break
        if time.monotonic() > deadline:
            skew_q.stop()
            raise TimeoutError(
                f"skew feed incomplete after {feed_timeout_secs}s: "
                f"{got} != {want}"
            )
        time.sleep(0.5)
    skew_q.stop()
    skew_q.awaitTermination()

    fetched_ok = sum(x.get("fetched_ok", 0) for x in per_batch)
    popped = sum(x.get("popped", 0) for x in per_batch)

    def _pct(xs: list[float], p: float) -> float:
        """Nearest-rank percentile — the soak's long-tail evidence."""
        if not xs:
            return 0.0
        s = sorted(xs)
        return round(s[min(len(s) - 1, max(0, int(-(-p * len(s) // 100)) - 1))], 3)

    return {
        "n_batches": n_batches,
        "batches_run": len(per_batch),
        "crawl_secs": round(crawl_secs, 3),
        "fetched_ok": fetched_ok,
        "popped": popped,
        "admitted": sum(x.get("admitted", 0) for x in per_batch),
        "fetched_urls_per_sec": round(fetched_ok / crawl_secs, 2) if crawl_secs else 0.0,
        "ready_counts": ready_counts,
        "snapshot_id": sched.store.snapshot_id,
        "per_batch": per_batch,
        # wall-clock observability ONLY (underscore key: parity
        # comparisons strip these — per_batch stays semantics-only):
        # per-tick latency distribution of the foreachBatch callback,
        # i.e. one full pop→fetch→MERGE→commit turn incl. sidecars
        "_observability": {
            "tick_secs": [round(x, 3) for x in tick_secs],
            "tick_p50_secs": _pct(tick_secs, 50),
            "tick_p90_secs": _pct(tick_secs, 90),
            "tick_p99_secs": _pct(tick_secs, 99),
            "tick_max_secs": _pct(tick_secs, 100),
        },
    }
