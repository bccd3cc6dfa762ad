"""Windowed/decayed host authority (round-4 judge missing #3) and the
adaptive × boost × politeness cap interaction audit (round-4 next #10).

Decay contract: per-batch edge folds are epoch-tagged; ranks derive from
the closed-form truncated sum(w_e * 0.5^(E-e)) — derived-only (no float
state persists), dyadic-exact (engine SQL sums == pure-Python sums bit
for bit), and rows past the window contribute EXACTLY zero, so the
maintenance purge is layout-only.
"""

from crawler_spark.simulator import CrawlSimulator, decayed_edges_py, pagerank_py
from crawler_spark.streaming.scheduler import CrawlScheduler

PA = dict(universe=500, n_seeds=16, k_per_host=2, tick_secs=6 * 3600)


def _run_parity(spark, root, n_batches, eng_kw, sim_kw):
    eng = CrawlScheduler(spark, root, use_sketch=True, lineage_hashes=False,
                         maintain_vindex=False, **PA, **eng_kw)
    eng.init()
    sim = CrawlSimulator(**PA, **sim_kw)
    for b in range(n_batches):
        batch_id = int(eng.store.properties().get("batch_id", 0))
        as_of = PA["tick_secs"] * batch_id + eng.t0_epoch
        sim_pop = [r["url_hash"] for r in sim._pop(as_of)]
        assert eng.popped_order(as_of) == sim_pop, f"batch {b} pop order"
        assert eng.run_batch() == sim.run_batch(), f"batch {b} counters"
    return eng, sim


def test_decayed_ranks_parity_and_purge(spark, tmp_path_factory):
    kw = dict(maintain_host_graph=True, rank_pop_boost=True,
              maintenance_every=2, host_rank_decay=True,
              host_rank_decay_window=2)
    sim_kw = dict(maintenance_every=2, rank_pop_boost=True,
                  host_rank_decay=True, host_rank_decay_window=2)
    root = str(tmp_path_factory.mktemp("decay"))
    eng, sim = _run_parity(spark, root, 6, kw, sim_kw)
    # engine's committed decayed ranks == the pure-Python closed form
    cur_epoch = (sim.batch_id - 1) // 2  # epoch of the last maintenance
    want = pagerank_py(decayed_edges_py(sim.host_edges_ep, cur_epoch, 2))
    got = {r["host_hash"]: r["pagerank"]
           for r in eng.store.read("host_ranks").collect()}
    assert got == want
    assert got, "no decayed ranks committed"
    # non-vacuity: decay CHANGED the authority signal vs additive-forever
    assert want != pagerank_py(sim.host_edges), "decay was inert"
    # truncation purge: no epochal row older than the window survives
    rows = eng.store.read("host_edges_epochal").collect()
    assert rows, "epochal folds missing"
    assert all(r["epoch"] > cur_epoch - 2 for r in rows), (
        "window purge left stale epochs behind"
    )
    # the epochal fold really spans multiple epochs (truncation bound)
    assert len({r["epoch"] for r in rows}) > 1
    # seen set + ledger parity (the decayed boost changed pop order
    # somewhere upstream of these, so equality is end-to-end evidence)
    seen_rows = eng.store.read("seen").select("url_hash", "verdict").collect()
    assert {r["url_hash"]: r["verdict"] for r in seen_rows} == sim.seen


def test_adaptive_boost_budget_interaction(spark, tmp_path_factory):
    """adaptive and boost MULTIPLY (frontier.py literal = k * 19 * boost)
    while the politeness budget still clamps every host: full parity
    with BOTH enabled, plus twin simulators proving each knob binds in
    the combined run, plus a ledger check that no host ever popped past
    its remaining quota."""
    kw = dict(adaptive_pop_caps=True, maintain_host_graph=True,
              rank_pop_boost=True, maintenance_every=2)
    sim_kw = dict(adaptive_pop_caps=True, maintenance_every=2,
                  rank_pop_boost=True)
    root = str(tmp_path_factory.mktemp("abb"))
    eng, sim = _run_parity(spark, root, 6, kw, sim_kw)
    # politeness ledger parity — the budget clamp held identically
    pol = {r["host_hash"]: (r["used_quota"], r["quota_day"])
           for r in eng.store.read("politeness").collect()}
    assert pol == {h: (v[0], v[2]) for h, v in sim.politeness.items()}
    # quota never exceeded
    assert all(v[0] <= v[1] for v in sim.politeness.values())
    # each knob BOUND: a twin without it diverges in pop order
    for drop in ("adaptive_pop_caps", "rank_pop_boost"):
        twin_kw = dict(sim_kw)
        twin_kw[drop] = False
        twin = CrawlSimulator(**PA, **twin_kw)
        for _ in range(6):
            twin.run_batch()
        assert twin.pop_log != sim.pop_log, f"{drop} was inert in the combo"
