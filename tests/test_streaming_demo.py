"""The foreachBatch streaming demo (SURVEY §8 candidate 4): the
streaming driver must be SEMANTICS-FREE (tables bit-identical to the
plain sequential loop), the live skew feed must agree with a batch
recompute over the same feed, and a resumed demo must be a no-op."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.streaming.demo import run_streaming_crawl
from crawler_spark.streaming.scheduler import CrawlScheduler
from crawler_spark.tables import table_state_hash

PARAMS = dict(
    universe=400, n_seeds=16, k_per_host=4, tick_secs=6 * 3600,
    lineage_hashes=False, maintenance_every=2,
)
N_BATCHES = 3
TABLES = ("frontier", "seen", "corpus", "pages", "items",
          "metrics_daily", "politeness")


@pytest.fixture(scope="module")
def demo_run(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("demo_stream"))
    out = run_streaming_crawl(
        spark, root, N_BATCHES, sink_name="t_demo_depth", **PARAMS
    )
    return root, out


def test_streaming_driver_is_semantics_free(spark, tmp_path_factory, demo_run):
    root, out = demo_run
    assert out["batches_run"] == N_BATCHES
    twin_root = str(tmp_path_factory.mktemp("demo_plain"))
    twin = CrawlScheduler(spark, twin_root, **PARAMS)
    twin.init()
    twin_stats = [twin.run_batch() for _ in range(N_BATCHES)]
    # per-batch counters identical (pop/fetch/admit/maintenance)...
    assert out["per_batch"] == twin_stats
    # ...and every table bit-identical, including the vindex sidecar
    # maintained on the maintenance tick inside the streaming run
    eng = CrawlScheduler(spark, root, **PARAMS)
    for t in TABLES:
        assert table_state_hash(eng.store.read(t)) == table_state_hash(
            twin.store.read(t)
        ), f"table {t} diverged under the streaming driver"
    for vt in ("emb_lsh", "doc_minhash"):
        assert table_state_hash(eng.vindex.store.read(vt)) == table_state_hash(
            twin.vindex.store.read(vt)
        ), f"vindex table {vt} diverged under the streaming driver"


def test_live_skew_feed_matches_batch_rollup(spark, demo_run):
    """The concurrent complete-mode skew feed, rolled up through the
    SHARED decade_rollup, equals a batch aggregation over the very feed
    files it consumed — the live monitor cannot drift from the batch
    query (same contract as test_host_depth_counts_match_batch, but over
    a feed emitted WHILE the crawl stream was running)."""
    from crawler_spark.queries_scale import decade_rollup

    root, out = demo_run
    feed_dir = root.rstrip("/") + "_stream/feed"
    batch_counts = (
        spark.read.parquet(feed_dir)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    def snap(df):
        return sorted(tuple(r) for r in decade_rollup(df).collect())
    live = snap(spark.table("t_demo_depth"))
    assert live == snap(batch_counts)
    assert len(live) >= N_BATCHES  # every tick surfaced a depth band
    # the feed is the pop's input signal: tick 0 saw exactly the seeds
    assert out["ready_counts"]["tick0000"] == PARAMS["n_seeds"]


def test_resumed_demo_is_noop(spark, demo_run):
    """Re-running the demo on the same root + work dir replays ticks the
    snapshot store already holds: zero batches run, snapshot unchanged —
    the batch_id guard makes the foreachBatch sink exactly-once."""
    root, out = demo_run
    again = run_streaming_crawl(
        spark, root, N_BATCHES, sink_name="t_demo_depth2", **PARAMS
    )
    assert again["batches_run"] == 0
    assert again["snapshot_id"] == out["snapshot_id"]
    assert again["ready_counts"] == out["ready_counts"]
