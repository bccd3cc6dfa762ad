"""Config layering (JSON < env) and the producer enable flags
(ref src/models/config.rs:4-9 / src/main.rs gates)."""

import json

from pyspark.sql import functions as F

from crawler_spark.config import CrawlConfig
from crawler_spark.streaming.scheduler import CrawlScheduler

PARAMS = dict(universe=400, n_seeds=10, k_per_host=4, tick_secs=3600,
              use_sketch=False, lineage_hashes=False)


def test_config_layering(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"universe": 123, "enable_discovery": False}))
    cfg = CrawlConfig.load(str(p), env={"CRAWLER_SPARK_UNIVERSE": "456",
                                        "CRAWLER_SPARK_ENABLE_RECRAWL": "false"})
    assert cfg.universe == 456            # env beats file
    assert cfg.enable_discovery is False  # file beats default
    assert cfg.enable_recrawl is False    # env beats default
    assert cfg.k_per_host == 8            # default survives


def test_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"not_a_knob": 1}))
    import pytest
    with pytest.raises(KeyError):
        CrawlConfig.load(str(p), env={})


def test_discovery_disabled_admits_nothing(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nodisc"))
    s = CrawlScheduler(spark, root, enable_discovery=False, **PARAMS)
    s.init()
    st1 = s.run_batch()
    st2 = s.run_batch()
    assert st1["admitted"] == 0 and st2["admitted"] == 0
    # frontier holds exactly the seeds, seen never grew
    assert s.store.read("frontier").count() == 10
    assert s.store.read("seen").count() == 10
    assert all(r["source"] in ("seed", "update")
               for r in s.store.read("frontier").select("source").collect())


def test_maintenance_is_semantics_free(spark, tmp_path_factory):
    """compact+gc during the crawl must not change any table content."""
    from crawler_spark.tables import table_state_hash

    hashes = []
    for maint in (None, 2):
        root = str(tmp_path_factory.mktemp(f"maint{maint}"))
        s = CrawlScheduler(spark, root, maintenance_every=maint, **PARAMS)
        s.init()
        [s.run_batch() for _ in range(4)]
        h = {
            t: table_state_hash(s.store.read(t))
            for t in ("frontier", "seen", "corpus")
        }
        # log rows embed store snapshot ids, which legitimately shift when
        # maintenance commits interleave — compare the semantic columns
        h["log"] = table_state_hash(
            s.store.read("snapshots_log").select("batch_id", "fetched", "errors")
        )
        hashes.append(h)
    assert hashes[0] == hashes[1]


def test_recrawl_disabled_never_repops(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("norecrawl"))
    # tick of a full day >> every staleness threshold's 3h minimum, so
    # WITH recrawl the same rows would re-pop; with it disabled they must not
    s = CrawlScheduler(spark, root, enable_discovery=False, enable_recrawl=False,
                       universe=400, n_seeds=10, k_per_host=4,
                       tick_secs=5 * 86400, use_sketch=False, lineage_hashes=False)
    s.init()
    st1 = s.run_batch()
    assert st1["popped"] > 0
    st2 = s.run_batch()
    assert st2["popped"] == 0  # everything already fetched once
    fetched_rows = s.store.read("frontier").filter(F.col("last_fetch_ts").isNotNull())
    assert fetched_rows.count() == st1["popped"]

def test_adaptive_pop_caps_parity(spark, tmp_path_factory):
    """adaptive_pop_caps (depth-decade pop caps, frontier.pop(adaptive=True))
    must keep engine == simulator batch-for-batch in the SAME mode — pop
    order, counters, politeness ledger — and must actually bite (the
    adaptive run pops differently from a flat-cap twin)."""
    from crawler_spark.simulator import CrawlSimulator

    P = dict(universe=500, n_seeds=10, k_per_host=2, tick_secs=6 * 3600)
    root = str(tmp_path_factory.mktemp("adaptivepop"))
    eng = CrawlScheduler(spark, root, adaptive_pop_caps=True,
                         use_sketch=False, lineage_hashes=False, **P)
    eng.init()
    sim = CrawlSimulator(adaptive_pop_caps=True, **P)
    flat = CrawlSimulator(**P)
    eng_stats, sim_stats, eng_pops = [], [], []
    for _ in range(4):
        batch_id = int(eng.store.properties().get("batch_id", 0))
        as_of = P["tick_secs"] * batch_id + eng.t0_epoch
        eng_pops.append(eng.popped_order(as_of))
        eng_stats.append(eng.run_batch())
        sim_stats.append(sim.run_batch())
        flat.run_batch()
    assert eng_stats == sim_stats
    for b in range(4):
        assert eng_pops[b] == sim.pop_log[b], f"batch {b} pop order"
    # non-vacuity: a host crossed a depth decade, so the caps diverged
    assert sim.pop_log != flat.pop_log
    # politeness ledger parity (the cap never exceeded any host's budget)
    rows = eng.store.read("politeness").collect()
    eng_pol = {r["host_hash"]: (r["used_quota"], r["quota_day"]) for r in rows}
    sim_pol = {h: (v[0], v[2]) for h, v in sim.politeness.items()}
    assert eng_pol == sim_pol
