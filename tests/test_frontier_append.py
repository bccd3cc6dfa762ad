"""Frontier hybrid commit (round-4 judge next #4): discovered rows are
insert-only by construction, so they land as bucket delta files while
popped-row replacements keep the CoW merge; a bucket receiving both
routes through the merge (the store's overlap guard enforces
disjointness). The hybrid store must be bit-identical to an all-CoW
twin — tables, lineage hashes, pop order — with delta lists bounded by
the fold cap and appended buckets' manifest stats FOLDED (not dropped)
so the pop's ready-scan pruning stays alive.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.tables import _bucket_paths, table_state_hash
from crawler_spark.streaming.scheduler import CrawlScheduler


def test_hybrid_equals_cow_twin(spark, tmp_path_factory):
    pa = dict(universe=500, n_seeds=16, k_per_host=4, tick_secs=6 * 3600)
    ra = str(tmp_path_factory.mktemp("fr_hyb"))
    rb = str(tmp_path_factory.mktemp("fr_cow"))
    a = CrawlScheduler(spark, ra, use_sketch=True, lineage_hashes=True,
                       frontier_append=True, **pa)
    b = CrawlScheduler(spark, rb, use_sketch=True, lineage_hashes=True,
                       frontier_append=False, **pa)
    a.init()
    b.init()
    a.store.bucket_append_max_files = 3  # force a fold within 4 batches
    for i in range(4):
        assert a.run_batch() == b.run_batch(), f"batch {i} counters"
    for t in ("frontier", "seen", "pages", "corpus", "items",
              "politeness", "metrics_daily", "seen_sketch"):
        assert table_state_hash(a.store.read(t)) == table_state_hash(
            b.store.read(t)
        ), t
    # the incremental global frontier hash (folded append sums) matches
    # the all-CoW twin's, batch by batch — the resume-proof record
    def _fr(s):
        return {
            r["batch_id"]: r["partition_state_hash"]
            for r in s.store.read("snapshots_log").collect()
            if r["table_name"] == "frontier"
        }
    assert _fr(a) == _fr(b)
    assert _fr(a), "no frontier lineage rows logged"
    # the hybrid path really appended (delta lists exist) and the fold
    # kept every bucket under the cap
    bm = a.store._bucket_map("frontier")
    lens = [len(_bucket_paths(v)) for v in bm.values()]
    assert any(n > 1 for n in lens), "hybrid mode never produced a delta"
    assert max(lens) <= 3
    # the all-CoW twin has no delta lists
    assert all(isinstance(v, str) for v in b.store._bucket_map("frontier").values())
    # appended buckets kept usable manifest stats (folded, not dropped):
    # at least one delta-list bucket still records next_fetch_ts bounds
    stats = a.store.table_stats("frontier")
    delta_lbls = [lbl for lbl, v in bm.items() if len(_bucket_paths(v)) > 1]
    assert any("next_fetch_ts" in stats.get(lbl, {}) for lbl in delta_lbls), (
        "append dropped every delta bucket's stats — pruning went dark"
    )
    # and the folded bounds are CORRECT (cover the bucket's true range)
    for lbl in delta_lbls:
        st = stats.get(lbl, {}).get("next_fetch_ts")
        if st is None:
            continue
        rows = a.store.read_buckets("frontier", [lbl]).agg(
            F.min("next_fetch_ts").alias("lo"), F.max("next_fetch_ts").alias("hi")
        ).collect()[0]
        # compare in epoch micros as the manifest records them
        import datetime as _dt

        def _us(ts):
            return int(ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)

        assert st[0] <= _us(rows["lo"]) and _us(rows["hi"]) <= st[1], lbl


def test_hybrid_overlap_guard(spark, tmp_path_factory):
    """Append rows hashing into a merge-dirty bucket must be rejected —
    silently double-landing them would duplicate keys."""
    from crawler_spark import synth
    from crawler_spark.tables import SnapshotStore, crawl_bucket_spec

    root = str(tmp_path_factory.mktemp("fr_guard"))
    st = SnapshotStore(spark, root, bucket_spec=crawl_bucket_spec(n_shards=4))
    fr = synth.build_seed_frontier(spark, 16, 1_700_000_000, 500)
    st.commit({"frontier": fr})
    some = st.read("frontier").limit(4).withColumn("depth", F.lit(7).cast("int"))
    plan = st.plan_merge("frontier", some, key="url_hash")
    with pytest.raises(ValueError, match="hybrid commit"):
        st.commit({}, merge={"frontier": plan}, bucket_append={"frontier": some})
