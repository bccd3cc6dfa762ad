"""Pipeline parity: the Spark engine vs the pure-Python reference
simulator on the same synthetic web (north_rule invariants).

Asserts, over multiple micro-batches:
  * per-batch pop ORDER equality (the hardest determinism contract);
  * per-batch counters (popped / ok / errors / admitted / rejected);
  * final URL-seen set equality (hash -> verdict);
  * final frontier state equality (priority, next_fetch, source, depth);
  * corpus caption equality + phash equality + decoded-pixel PSNR>=40dB
    (input_hint per-row invariant);
  * politeness ledger equality;
  * kill/resume bit-identity: a run interrupted after batch k and resumed
    in a NEW scheduler object ends with identical state hashes.
"""

from datetime import timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark import kernels, synth
from crawler_spark.simulator import CrawlSimulator
from crawler_spark.streaming.scheduler import CrawlScheduler
from crawler_spark.tables import table_state_hash

PARAMS = dict(universe=600, n_seeds=12, k_per_host=4, tick_secs=6 * 3600)
N_BATCHES = 4


@pytest.fixture(scope="module")
def engine_and_sim(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawlstore"))
    eng = CrawlScheduler(spark, root, use_sketch=True, lineage_hashes=False, **PARAMS)
    eng.init()
    sim = CrawlSimulator(**PARAMS)
    eng_stats, sim_stats, eng_pops = [], [], []
    for _ in range(N_BATCHES):
        batch_id = int(eng.store.properties().get("batch_id", 0))
        as_of = PARAMS["tick_secs"] * batch_id + eng.t0_epoch
        eng_pops.append(eng.popped_order(as_of))
        eng_stats.append(eng.run_batch())
        sim_stats.append(sim.run_batch())
    return eng, sim, eng_stats, sim_stats, eng_pops


def test_batch_counters_match(engine_and_sim):
    _, _, eng_stats, sim_stats, _ = engine_and_sim
    assert eng_stats == sim_stats
    assert sum(s["popped"] for s in eng_stats) > 30  # the crawl actually ran
    assert any(s["admitted"] > 0 for s in eng_stats)  # discovery happened


def test_pop_order_matches(engine_and_sim):
    _, sim, _, _, eng_pops = engine_and_sim
    # engine pop order (total order: priority, next_fetch_ts, url_hash)
    # must equal the simulator's sequential pop order EXACTLY per batch
    for b in range(N_BATCHES):
        assert eng_pops[b] == sim.pop_log[b], f"batch {b} pop order"


def test_seen_set_matches(engine_and_sim):
    eng, sim, *_ = engine_and_sim
    rows = eng.store.read("seen").select("url_hash", "verdict").collect()
    eng_seen = {r["url_hash"]: r["verdict"] for r in rows}
    assert eng_seen == sim.seen


def test_frontier_state_matches(engine_and_sim):
    eng, sim, *_ = engine_and_sim
    rows = eng.store.read("frontier").collect()
    eng_fr = {
        r["url_hash"]: (
            r["priority"],
            int(r["next_fetch_ts"].replace(tzinfo=timezone.utc).timestamp()),
            r["source"],
            r["depth"],
        )
        for r in rows
    }
    sim_fr = {
        h: (r["priority"], r["next_fetch_epoch"], r["source"], r["depth"])
        for h, r in sim.frontier.items()
    }
    assert eng_fr == sim_fr


def test_corpus_captions_phash_and_pixels(engine_and_sim):
    eng, sim, *_ = engine_and_sim
    rows = eng.store.read("corpus").collect()
    eng_corpus = {r["image_id"]: r for r in rows}
    assert set(eng_corpus) == set(sim.corpus)
    for image_id, sim_row in sim.corpus.items():
        e = eng_corpus[image_id]
        assert e["caption"] == sim_row["caption"]          # caption equality
        assert e["phash"] == sim_row["phash"]              # phash parity
        px_e = kernels.decode_image(bytes(e["bytes"]))
        px_s = kernels.decode_image(sim_row["bytes"])
        assert np.array_equal(px_e, px_s)                  # decoded allclose
        src = synth.content_pixels(image_id)
        assert kernels.psnr(src, px_e) >= 40.0             # PSNR invariant


def test_pages_normalization_matches(engine_and_sim):
    """Cross-validates the Spark-side normalize expressions (keyword
    regexp_extract_all, language pandas UDF, lowercase/casts) against the
    pure kernels the simulator calls directly."""
    eng, sim, *_ = engine_and_sim
    rows = eng.store.read("pages").collect()
    eng_pages = {r["url_hash"]: r for r in rows}
    assert set(eng_pages) == set(sim.pages)
    for uh, sp in sim.pages.items():
        e = eng_pages[uh]
        assert e["title"] == sp["title"]
        assert e["country"] == sp["country"]
        assert list(e["keywords"] or []) == sp["keywords"]
        assert e["language"] == sp["language"]
        assert e["views"] == sp["views"]
        assert e["subscribers"] == sp["subscribers"]
        assert e["error_msg"] == sp["error_msg"]
        if sp["published_epoch"] is not None:
            got = int(e["published_ts"].replace(tzinfo=timezone.utc).timestamp())
            assert got == sp["published_epoch"]
        # A1/A3 write-back parity (ref videoCount/lastUploadAt)
        assert e["item_count"] == sp["item_count"]
        if sp["last_item_epoch"] is None:
            assert e["last_item_ts"] is None
        else:
            got = int(e["last_item_ts"].replace(tzinfo=timezone.utc).timestamp())
            assert got == sp["last_item_epoch"]


def test_items_table_matches(engine_and_sim):
    """The per-item sub-pipeline (XML feed parse -> J1 lookup -> P9
    staleness gate -> upsert) batch-for-batch against the simulator,
    which parses the SAME feed strings through the same kernel."""
    eng, sim, *_ = engine_and_sim
    rows = eng.store.read("items").collect()
    eng_items = {
        (r["url_hash"], r["item_id"]): (
            r["title"],
            int(r["published_ts"].replace(tzinfo=timezone.utc).timestamp()),
            int(r["updated_ts"].replace(tzinfo=timezone.utc).timestamp()),
            r["views"],
        )
        for r in rows
    }
    sim_items = {
        k: (v["title"], v["published_epoch"], v["updated_epoch"], v["views"])
        for k, v in sim.items.items()
    }
    assert eng_items == sim_items
    assert len(eng_items) > 0  # the sub-pipeline actually ran


def test_politeness_ledger_matches(engine_and_sim):
    eng, sim, *_ = engine_and_sim
    rows = eng.store.read("politeness").collect()
    eng_pol = {r["host_hash"]: (r["used_quota"], r["quota_day"]) for r in rows}
    sim_pol = {h: (v[0], v[2]) for h, v in sim.politeness.items()}
    assert eng_pol == sim_pol


def test_robots_never_crawled_disallowed(engine_and_sim):
    eng, *_ = engine_and_sim
    urls = [r["url"] for r in eng.store.read("frontier").select("url").collect()]
    seeds = set(synth.seed_urls(PARAMS["n_seeds"], PARAMS["universe"]))
    for u in urls:
        # discovered (non-seed) URLs must respect robots (seeds are
        # operator-submitted, ref `additional` bypasses discovery checks)
        if u not in {kernels.canonicalize_url(s) for s in seeds}:
            assert synth.robots_allowed(u), u


def test_kill_resume_bit_identity(spark, tmp_path_factory):
    """Run A: 3 batches straight. Run B: 2 batches, 'crash' (drop the
    scheduler), new scheduler on the same root, 1 more batch. Final table
    hashes must be identical (north_rule resume)."""
    pa = dict(PARAMS)
    pa["universe"] = 400
    root_a = str(tmp_path_factory.mktemp("runA"))
    root_b = str(tmp_path_factory.mktemp("runB"))
    a = CrawlScheduler(spark, root_a, use_sketch=False, lineage_hashes=False, **pa)
    a.init()
    [a.run_batch() for _ in range(3)]
    b1 = CrawlScheduler(spark, root_b, use_sketch=False, lineage_hashes=False, **pa)
    b1.init()
    [b1.run_batch() for _ in range(2)]
    del b1
    b2 = CrawlScheduler(spark, root_b, use_sketch=False, lineage_hashes=False, **pa)
    b2.init()  # idempotent on a non-empty store
    b2.run_batch()
    for t in ("frontier", "seen", "corpus", "pages", "items", "metrics_daily", "politeness"):
        ha = table_state_hash(a.store.read(t))
        hb = table_state_hash(b2.store.read(t))
        assert ha == hb, f"table {t} diverged after resume"
    assert a.store.properties()["batch_id"] == b2.store.properties()["batch_id"]


def test_sketch_off_equals_sketch_on(spark, tmp_path_factory):
    """The sketch is an accelerator only: off / broadcast probe /
    partitioned (cogroup) probe must all produce identical state."""
    pa = dict(PARAMS)
    pa["universe"] = 400
    variants = [
        dict(use_sketch=True, sketch_probe="broadcast"),
        dict(use_sketch=False),
        dict(use_sketch=True, sketch_probe="partitioned"),
    ]
    outs = []
    for i, v in enumerate(variants):
        root = str(tmp_path_factory.mktemp(f"sk{i}"))
        s = CrawlScheduler(spark, root, lineage_hashes=False, **pa, **v)
        s.init()
        [s.run_batch() for _ in range(2)]
        outs.append({
            t: table_state_hash(s.store.read(t))
            for t in ("frontier", "seen", "corpus")
        })
    assert outs[0] == outs[1] == outs[2]


def test_mixed_cadence_parity(spark, tmp_path_factory):
    """Per-producer cadences (round-2): discovery gated to every 2nd
    batch (12 h interval on a 6 h tick), recrawl to every 4th — engine
    and simulator must still agree on counters, pop order, seen set and
    the politeness ledger (which now charges PER API PAGE)."""
    pa = dict(universe=500, n_seeds=10, k_per_host=4, tick_secs=6 * 3600,
              discovery_interval_secs=12 * 3600, recrawl_interval_secs=24 * 3600)
    root = str(tmp_path_factory.mktemp("cadence"))
    eng = CrawlScheduler(spark, root, use_sketch=True, lineage_hashes=False, **pa)
    eng.init()
    sim = CrawlSimulator(**pa)
    eng_stats, sim_stats = [], []
    for b in range(5):
        batch_id = int(eng.store.properties().get("batch_id", 0))
        as_of = pa["tick_secs"] * batch_id + eng.t0_epoch
        recrawl_open = sim._gate(as_of, sim.last_recrawl_epoch, pa["recrawl_interval_secs"])
        sim_pop = [r["url_hash"] for r in sim._pop(as_of, recrawl_open)]
        assert eng.popped_order(as_of) == sim_pop, f"batch {b} pop order"
        eng_stats.append(eng.run_batch())
        sim_stats.append(sim.run_batch())
    assert eng_stats == sim_stats
    # the cadence actually bit: some batches discovered nothing
    assert any(s["admitted"] == 0 for s in eng_stats)
    assert any(s["admitted"] > 0 for s in eng_stats)
    rows = eng.store.read("seen").select("url_hash", "verdict").collect()
    assert {r["url_hash"]: r["verdict"] for r in rows} == sim.seen
    pol = {r["host_hash"]: (r["used_quota"], r["quota_day"])
           for r in eng.store.read("politeness").collect()}
    assert pol == {h: (v[0], v[2]) for h, v in sim.politeness.items()}


def test_wap_loop_matches_plain_run(spark, tmp_path_factory):
    """wap_audit=True stages each batch on a branch, audits the
    changelog, and publishes — semantics-free when audits pass: final
    state and snapshot history must be bit-identical to a plain run."""
    pa = dict(PARAMS)
    pa["universe"] = 400
    root_p = str(tmp_path_factory.mktemp("plain"))
    root_w = str(tmp_path_factory.mktemp("wap"))
    p = CrawlScheduler(spark, root_p, use_sketch=False, lineage_hashes=False, **pa)
    w = CrawlScheduler(
        spark, root_w, use_sketch=False, lineage_hashes=False, wap_audit=True, **pa
    )
    p.init(), w.init()
    for _ in range(2):
        sp, sw = p.run_batch(), w.run_batch()
        assert sp == sw
    assert p.store.snapshot_id == w.store.snapshot_id
    for t in ("frontier", "seen", "corpus", "politeness"):
        assert table_state_hash(p.store.read(t)) == table_state_hash(
            w.store.read(t)
        ), f"table {t} diverged under WAP"
    assert w.store.branch_state("wap") is None  # nothing left staged


def test_wap_stale_branch_discarded_on_reopen(spark, tmp_path_factory):
    """A crash between stage and publish leaves an unpublished branch;
    reopening the scheduler discards it (staged == uncommitted) and the
    replayed batch lands bit-identically to an uninterrupted run."""
    pa = dict(PARAMS)
    pa["universe"] = 400
    root_a = str(tmp_path_factory.mktemp("wapA"))
    root_b = str(tmp_path_factory.mktemp("wapB"))
    a = CrawlScheduler(
        spark, root_a, use_sketch=False, lineage_hashes=False, wap_audit=True, **pa
    )
    a.init()
    [a.run_batch() for _ in range(2)]

    b1 = CrawlScheduler(
        spark, root_b, use_sketch=False, lineage_hashes=False, wap_audit=True, **pa
    )
    b1.init()
    b1.run_batch()
    # simulate the crash: batch 2 staged on the branch but never published
    st = b1.store
    staged = st.read("blacklist").unionByName(
        spark.createDataFrame([(424242,)], "url_hash long")
    )
    st.commit({"blacklist": staged}, branch="wap")
    assert st.branch_state("wap") is not None
    del b1
    b2 = CrawlScheduler(
        spark, root_b, use_sketch=False, lineage_hashes=False, wap_audit=True, **pa
    )
    assert b2.store.branch_state("wap") is None  # discarded at reopen
    b2.init()
    b2.run_batch()
    for t in ("frontier", "seen", "corpus", "politeness", "blacklist"):
        assert table_state_hash(a.store.read(t)) == table_state_hash(
            b2.store.read(t)
        ), f"table {t} diverged after stale-branch recovery"


def test_rebucket_frontier_midcrawl_preserves_run(spark, tmp_path_factory):
    """Partition evolution under load: rebucket the frontier mid-crawl
    (16 -> 32 buckets), reopen, keep crawling — final state must be
    bit-identical to a run that never changed layout (content is
    layout-independent; only commit I/O granularity changes)."""
    pa = dict(PARAMS)
    pa["universe"] = 400
    root_a = str(tmp_path_factory.mktemp("rbA"))
    root_b = str(tmp_path_factory.mktemp("rbB"))
    a = CrawlScheduler(spark, root_a, use_sketch=False, **pa)
    a.init()
    [a.run_batch() for _ in range(3)]
    b = CrawlScheduler(spark, root_b, use_sketch=False, **pa)
    b.init()
    [b.run_batch() for _ in range(2)]
    b.store.rebucket("frontier", 32)
    del b
    b2 = CrawlScheduler(spark, root_b, use_sketch=False, **pa)
    b2.init()
    b2.run_batch()
    for t in ("frontier", "seen", "corpus", "pages", "politeness"):
        assert table_state_hash(a.store.read(t)) == table_state_hash(
            b2.store.read(t)
        ), f"table {t} diverged after rebucket"
    # and the evolved layout is actually in effect for new commits
    assert b2.store.bucket_spec["frontier"]["n"] == 32
    # lineage ran INCREMENTALLY through the respec: the last logged
    # frontier hash (rebuilt from new-layout bucket sums after the
    # respec invalidated the old ones) must equal the full recompute
    last = (
        b2.store.read("snapshots_log")
        .filter(F.col("table_name") == "frontier")
        .orderBy(F.col("snapshot_id").desc())
        .limit(1)
        .collect()[0]
    )
    assert last["partition_state_hash"] == table_state_hash(
        b2.store.read("frontier")
    )


def test_robots_directives_parity_with_binding_crawl_delay(
    spark, tmp_path_factory
):
    """Richer robots, end to end: with a 6 s tick the Crawl-delay
    directive BINDS (4000 ms -> 1 pop/batch for that host) and the
    popped hosts' Sitemap URLs enter discovery — engine and simulator
    must still agree on counters, pop order, seen set and ledger, and
    both effects must be non-vacuous on the synthetic web."""
    pa = dict(universe=500, n_seeds=16, k_per_host=4, tick_secs=6)
    root = str(tmp_path_factory.mktemp("robots_rich"))
    eng = CrawlScheduler(spark, root, use_sketch=True, lineage_hashes=False, **pa)
    eng.init()
    sim = CrawlSimulator(**pa)
    eng_stats, sim_stats = [], []
    for b in range(4):
        batch_id = int(eng.store.properties().get("batch_id", 0))
        as_of = pa["tick_secs"] * batch_id + eng.t0_epoch
        sim_pop = [r["url_hash"] for r in sim._pop(as_of)]
        assert eng.popped_order(as_of) == sim_pop, f"batch {b} pop order"
        eng_stats.append(eng.run_batch())
        sim_stats.append(sim.run_batch())
    assert eng_stats == sim_stats
    rows = eng.store.read("seen").select("url_hash", "verdict").collect()
    assert {r["url_hash"]: r["verdict"] for r in rows} == sim.seen
    pol = {r["host_hash"]: (r["used_quota"], r["quota_day"])
           for r in eng.store.read("politeness").collect()}
    assert pol == {h: (v[0], v[2]) for h, v in sim.politeness.items()}
    # non-vacuity (a): the directive bit — a strict-delay host was
    # rate-capped below what its quota would have allowed
    strict = {h for h, d in sim.crawl_delay.items() if d >= 2000}
    assert strict, "synthetic web has no strict-delay host"
    eng_frontier = {r["url_hash"]: r for r in
                    eng.store.read("frontier").collect()}
    host_of = {r["url_hash"]: r["host_hash"] for r in eng_frontier.values()}
    for b, popped in enumerate(sim.pop_log):
        per = {}
        for uh in popped:
            hh = host_of.get(uh)
            if hh in strict:
                per[hh] = per.get(hh, 0) + 1
        for hh, n in per.items():
            cap = (pa["tick_secs"] * 1000) // sim.crawl_delay[hh]
            assert n <= max(cap, 0), f"batch {b}: host {hh} popped {n}"
    # non-vacuity (b): a sitemap URL entered BOTH frontiers identically
    eng_sm = {r["url"] for r in eng_frontier.values() if "/sitemap/" in r["url"]}
    sim_sm = {r["url"] for r in sim.frontier.values() if "/sitemap/" in r["url"]}
    assert eng_sm == sim_sm
    assert eng_sm, "no sitemap URL was ever admitted"


def test_robots_refetch_staleness_parity(spark, tmp_path_factory):
    """Robots REFETCH staleness, end to end: with a 12 h TTL and a 12 h
    content change period, hosts popped in batch 0 refetch at version 0
    (fetched_ts bump only) and re-refetch from batch 2 on at version 1+
    — CHANGED rules/directives that must bind identically in engine and
    simulator (pop order, counters, seen set, ledger), and the robots
    TABLE itself must mirror the simulator's per-host fetched/version
    state row for row."""
    pa = dict(
        universe=500, n_seeds=16, k_per_host=4, tick_secs=6 * 3600,
        robots_ttl_secs=12 * 3600, robots_change_period_secs=12 * 3600,
    )
    root = str(tmp_path_factory.mktemp("robots_refetch"))
    eng = CrawlScheduler(spark, root, use_sketch=True, lineage_hashes=False, **pa)
    eng.init()
    sim = CrawlSimulator(**pa)
    eng_stats, sim_stats = [], []
    for b in range(5):
        batch_id = int(eng.store.properties().get("batch_id", 0))
        as_of = pa["tick_secs"] * batch_id + eng.t0_epoch
        sim_pop = [r["url_hash"] for r in sim._pop(as_of)]
        assert eng.popped_order(as_of) == sim_pop, f"batch {b} pop order"
        eng_stats.append(eng.run_batch())
        sim_stats.append(sim.run_batch())
    assert eng_stats == sim_stats
    rows = eng.store.read("seen").select("url_hash", "verdict").collect()
    assert {r["url_hash"]: r["verdict"] for r in rows} == sim.seen
    pol = {r["host_hash"]: (r["used_quota"], r["quota_day"])
           for r in eng.store.read("politeness").collect()}
    assert pol == {h: (v[0], v[2]) for h, v in sim.politeness.items()}
    # robots TABLE parity: every row's fetched_ts and content must equal
    # the simulator's per-host (fetched_epoch, version) state
    eng_robots = {r["host_hash"]: r for r in eng.store.read("robots").collect()}
    assert set(eng_robots) == set(sim.robots_fetched)
    for hh, row in eng_robots.items():
        host = sim._host_by_hash[hh]
        ver = sim.robots_version[hh]
        fetched = int(row["fetched_ts"].replace(tzinfo=timezone.utc).timestamp())
        assert fetched == sim.robots_fetched[hh], f"host {host} fetched_ts"
        d = synth.robots_directives_for_host(host, ver)
        assert row["crawl_delay_ms"] == d["crawl_delay_ms"], f"host {host} delay"
        assert list(row["sitemap_urls"]) == d["sitemap_urls"], f"host {host} sitemaps"
        rules = [(x["allow"], x["path_prefix"])
                 for x in synth.robots_rules_for_host(host, ver)]
        assert [(x["allow"], x["path_prefix"]) for x in row["rules"]] == rules
    # non-vacuity (a): some popped host reached version >= 1 with content
    # that actually DIFFERS from its version-0 draw
    bumped = [hh for hh, v in sim.robots_version.items() if v >= 1]
    assert bumped, "no host ever refetched at a new content version"
    changed = [
        hh for hh in bumped
        if synth.robots_directives_for_host(sim._host_by_hash[hh], sim.robots_version[hh])
        != synth.robots_directives_for_host(sim._host_by_hash[hh])
        or synth.robots_rules_for_host(sim._host_by_hash[hh], sim.robots_version[hh])
        != synth.robots_rules_for_host(sim._host_by_hash[hh])
    ]
    assert changed, "every refetched host drew identical content"
    # non-vacuity (b): the refetch changed crawl BEHAVIOR — a twin
    # simulator with the TTL off (robots cached forever) diverges
    twin = CrawlSimulator(**{**pa, "robots_ttl_secs": 0})
    twin.run(5)
    assert sim.seen != twin.seen or sim.pop_log != twin.pop_log, (
        "refetch was behaviorally inert — pick params where a changed "
        "rule or directive binds"
    )


def test_host_graph_parity(spark, tmp_path_factory):
    """Loop-maintained host link graph: the per-batch additive edge fold
    must equal the simulator's pure-Python recount exactly (integer
    counts — bit-identity, the incremental-fold invariant), and the
    maintenance-tick host_ranks must equal a from-scratch PageRank over
    the folded edge table."""
    from crawler_spark.queries import cleanup_caches
    from crawler_spark.queries_graph import pagerank_over_edges

    pa = dict(universe=500, n_seeds=16, k_per_host=4, tick_secs=6 * 3600)
    root = str(tmp_path_factory.mktemp("hostgraph"))
    eng = CrawlScheduler(
        spark, root, use_sketch=True, lineage_hashes=False,
        maintain_host_graph=True, maintenance_every=2, maintain_vindex=False,
        **pa,
    )
    eng.init()
    sim = CrawlSimulator(**pa)
    for b in range(4):
        assert eng.run_batch() == sim.run_batch(), f"batch {b} counters"
    rows = eng.store.read("host_edges").collect()
    eng_edges = {(r["src"], r["dst"]): r["w"] for r in rows}
    assert eng_edges == sim.host_edges
    assert eng_edges, "host graph is empty"
    # the fold actually ACCUMULATED (same edge seen more than once)
    assert any(w > 1 for w in eng_edges.values()), "no edge count exceeded 1"
    ranks = {r["host_hash"]: r["pagerank"]
             for r in eng.store.read("host_ranks").collect()}
    expect = {
        r["host"]: r["pagerank"]
        for r in pagerank_over_edges(eng.store.read("host_edges")).collect()
    }
    cleanup_caches()
    assert ranks == expect
    assert ranks, "host_ranks is empty"


def test_seen_append_equals_cow_merge_twin(spark, tmp_path_factory):
    """The seen table's invlist-append path (default) must be
    bit-identical to a twin scheduler using CoW shard rewrites: every
    table including the sketches and the per-shard lineage hashes, with
    the append store actually holding delta files bounded by the fold
    cap."""
    from crawler_spark.tables import _bucket_paths

    pa = dict(universe=500, n_seeds=16, k_per_host=4, tick_secs=6 * 3600)
    ra = str(tmp_path_factory.mktemp("seen_ba"))
    rb = str(tmp_path_factory.mktemp("seen_cow"))
    a = CrawlScheduler(spark, ra, use_sketch=True, lineage_hashes=True,
                       seen_append=True, **pa)
    b = CrawlScheduler(spark, rb, use_sketch=True, lineage_hashes=True,
                       seen_append=False, **pa)
    a.init()
    b.init()
    a.store.bucket_append_max_files = 3  # force a fold within 4 batches
    for i in range(4):
        assert a.run_batch() == b.run_batch(), f"batch {i} counters"
    for t in ("seen", "frontier", "seen_sketch", "politeness", "pages",
              "corpus", "items", "metrics_daily"):
        assert table_state_hash(a.store.read(t)) == table_state_hash(
            b.store.read(t)
        ), t
    # per-shard lineage hashes agree (the resume-proof state record)
    def _lin(s):
        return {
            (r["batch_id"], r["table_name"]): r["partition_state_hash"]
            for r in s.store.read("snapshots_log").collect()
            if r["table_name"].startswith("seen/")
        }
    assert _lin(a) == _lin(b)
    assert _lin(a), "no seen shard lineage rows logged"
    # the append path really appended (delta lists exist) and the fold
    # kept every shard under the cap
    bm = a.store._bucket_map("seen")
    lens = [len(_bucket_paths(v)) for v in bm.values()]
    assert max(lens) <= 3
    assert any(n > 1 for n in lens), "append mode never produced a delta"
    bm_b = b.store._bucket_map("seen")
    assert all(isinstance(v, str) for v in bm_b.values())


def test_rank_boosted_pops_parity_and_bind(spark, tmp_path_factory):
    """PageRank consumed by the pop: with maintain_host_graph +
    rank_pop_boost, the top decile of loop-maintained host_ranks doubles
    its pop cap from the batch after the first maintenance tick. Engine
    and simulator (pure-Python PageRank twin, same per-iteration
    rounding) must agree on pop order, counters, seen set and ledger;
    the engine's rank VALUES must equal the Python twin's to all 6
    decimals; and the boost must BIND (some host pops past its unboosted
    cap)."""
    from crawler_spark.simulator import pagerank_py

    pa = dict(universe=500, n_seeds=16, k_per_host=2, tick_secs=6 * 3600)
    root = str(tmp_path_factory.mktemp("rankboost"))
    eng = CrawlScheduler(
        spark, root, use_sketch=True, lineage_hashes=False,
        maintain_host_graph=True, rank_pop_boost=True,
        maintenance_every=2, maintain_vindex=False, **pa,
    )
    eng.init()
    sim = CrawlSimulator(maintenance_every=2, rank_pop_boost=True, **pa)
    eng_stats, sim_stats = [], []
    for b in range(6):
        batch_id = int(eng.store.properties().get("batch_id", 0))
        as_of = pa["tick_secs"] * batch_id + eng.t0_epoch
        sim_pop = [r["url_hash"] for r in sim._pop(as_of)]
        assert eng.popped_order(as_of) == sim_pop, f"batch {b} pop order"
        eng_stats.append(eng.run_batch())
        sim_stats.append(sim.run_batch())
    assert eng_stats == sim_stats
    rows = eng.store.read("seen").select("url_hash", "verdict").collect()
    assert {r["url_hash"]: r["verdict"] for r in rows} == sim.seen
    pol = {r["host_hash"]: (r["used_quota"], r["quota_day"])
           for r in eng.store.read("politeness").collect()}
    assert pol == {h: (v[0], v[2]) for h, v in sim.politeness.items()}
    # engine ranks == Python twin, to the last rounded decimal
    eng_ranks = {r["host_hash"]: r["pagerank"]
                 for r in eng.store.read("host_ranks").collect()}
    assert eng_ranks == pagerank_py(sim.host_edges)
    assert eng_ranks, "no ranks committed"
    # non-vacuity: the boost BOUND — after ranks existed, some boosted
    # host popped more than the unboosted cap in one batch
    assert sim._boosted, "boost set empty"
    host_of = {r["url_hash"]: r["host_hash"]
               for r in eng.store.read("frontier").collect()}
    bound = False
    for popped in sim.pop_log[2:]:
        per: dict = {}
        for uh in popped:
            hh = host_of.get(uh)
            per[hh] = per.get(hh, 0) + 1
        if any(hh in sim._boosted and n > pa["k_per_host"]
               for hh, n in per.items()):
            bound = True
    assert bound, "boost never exceeded the unboosted cap — inert"
