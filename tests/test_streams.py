"""Structured Streaming surface: watermarked windowed agg and stateful
first-seen dedup, drained with availableNow and checked against the
equivalent batch computation on the same input."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.streaming import streams
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    return streams.stage_events_dir(SF_SMALL, str(tmp_path_factory.mktemp("evdir")))


@pytest.fixture(scope="module")
def drained_counts(spark, events_dir, tmp_path_factory):
    ev = streams.events_stream(spark, events_dir)
    df = streams.windowed_counts(ev)
    streams.run_to_memory(df, "win_counts", str(tmp_path_factory.mktemp("ckpt_w")))
    return spark.sql("SELECT * FROM win_counts").collect()


def test_windowed_counts_match_batch(spark, drained_counts):
    got = {(r["win_start"], r["event_type"]): (r["n"], r["sum_value"]) for r in drained_counts}
    batch = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value")
        .collect()
    )
    want = {(r["win_start"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch}
    # single input file + availableNow: no late data beyond watermark, so
    # the streaming result must equal the batch aggregation exactly
    assert got == want
    assert len(got) > 10


def test_streaming_driven_crawl_loop(spark, tmp_path_factory):
    """The crawl advances when driven by a Structured Streaming trigger
    (rate source + foreachBatch), and the result equals a directly-driven
    run — the trigger is only a clock."""
    from crawler_spark.streaming.loop import run_streaming_loop
    from crawler_spark.streaming.scheduler import CrawlScheduler
    from crawler_spark.tables import table_state_hash

    P = dict(universe=300, n_seeds=8, k_per_host=4, tick_secs=6 * 3600,
             use_sketch=False, lineage_hashes=False)
    root_s = str(tmp_path_factory.mktemp("stream_loop"))
    sched = CrawlScheduler(spark, root_s, **P)
    reached = run_streaming_loop(
        sched, str(tmp_path_factory.mktemp("ckpt_loop")), n_batches=2
    )
    assert reached >= 2
    root_d = str(tmp_path_factory.mktemp("direct_loop"))
    direct = CrawlScheduler(spark, root_d, **P)
    direct.init()
    for _ in range(reached):
        direct.run_batch()
    for t in ("frontier", "seen", "corpus"):
        assert table_state_hash(sched.store.read(t)) == table_state_hash(direct.store.read(t))


def test_stateful_first_seen(spark, events_dir, tmp_path_factory):
    ev = streams.events_stream(spark, events_dir)
    df = streams.stateful_first_seen(ev.select("user_id", "event_id"))
    streams.run_to_memory(df, "first_seen", str(tmp_path_factory.mktemp("ckpt_s")))
    rows = spark.sql("SELECT * FROM first_seen").collect()
    batch = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy("user_id")
        .agg(F.min("event_id").alias("first_event_id"), F.count("*").alias("n_new"))
        .collect()
    )
    got = {r["user_id"]: (r["first_event_id"], r["n_new"]) for r in rows}
    want = {r["user_id"]: (r["first_event_id"], r["n_new"]) for r in batch}
    # every key appears exactly once (dedup-with-state), with its first id
    assert got == want


def test_stateful_rate_limit_caps_per_key(spark, tmp_path):
    """T4 twin: at most k events admitted per key across the whole
    stream, lowest event_ids first (deterministic admission)."""
    from crawler_spark.streaming import streams

    d = streams.stage_events_dir(SF_SMALL, str(tmp_path / "ev_rate"))
    ev = streams.events_stream(spark, d)
    out = streams.stateful_rate_limit(ev, k=3)
    streams.run_to_memory(out, "rate_limited", str(tmp_path / "ck_rate"))
    got = spark.sql("SELECT * FROM rate_limited").toPandas()
    per_key = got.groupby("user_id")["event_id"].agg(["count", "min"])
    assert (per_key["count"] <= 3).all()
    # admitted == the 3 smallest event_ids of each user (batch order can't leak)
    import duckdb
    truth = duckdb.sql(
        f"""SELECT user_id, event_id FROM (
              SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id) rn
              FROM parquet_scan('{SF_SMALL}/events.parquet')) WHERE rn <= 3"""
    ).df()
    a = set(map(tuple, got[["user_id", "event_id"]].itertuples(index=False)))
    b = set(map(tuple, truth.itertuples(index=False)))
    assert a == b

def test_host_depth_counts_match_batch(spark, events_dir, tmp_path_factory):
    """The streaming per-host depth counts, rolled up through the SHARED
    decade_rollup, equal the batch host_depth_histogram query on the same
    events — the skew monitor's live feed cannot drift from the registered
    query (queries_scale.decade_rollup is the one definition)."""
    from crawler_spark.queries_scale import decade_rollup, q_host_depth_histogram

    ev = streams.events_stream(spark, events_dir)
    df = streams.host_depth_counts(ev)
    streams.run_to_memory(
        df, "host_depth", str(tmp_path_factory.mktemp("ckpt_h")), mode="complete"
    )
    live = decade_rollup(spark.sql("SELECT * FROM host_depth")).collect()
    batch = q_host_depth_histogram(spark, SF_SMALL).collect()

    def snap(rows):
        return {
            (r["event_type"], r["digits"]): (
                r["n_hosts"], r["min_depth"], r["max_depth"], r["urls"], r["share"]
            )
            for r in rows
        }

    got, want = snap(live), snap(batch)
    assert got == want
    assert len(got) >= 3
