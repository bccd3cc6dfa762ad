"""Schema evolution on the SnapshotStore (Iceberg ALTER TABLE parity).

An evolve() is a METADATA-ONLY commit: no data file is rewritten, old
buckets reconcile at read time (added columns surface as typed NULLs —
Iceberg v1/v2 add-column semantics), time travel returns the
schema-at-snapshot, and the next CoW merge lazily migrates only its
dirty buckets. Stores that never evolve keep byte-identical manifests
and their exact legacy read plans.
"""

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.tables import SnapshotStore

SPEC4 = {"blacklist": {"mode": "hash", "key": "url_hash", "n": 4}}


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "evo"), bucket_spec=SPEC4)


def _bl(spark, keys):
    return spark.createDataFrame([(int(k),) for k in keys], "url_hash long")


def _snap_dirs(store):
    p = os.path.join(store.root, "data", "blacklist")
    return sorted(os.listdir(p)) if os.path.exists(p) else []


def test_evolve_add_is_metadata_only(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})
    before = _snap_dirs(store)
    sid = store.evolve("blacklist", add=[("note", "string")])
    assert sid == 2
    # no data dir written by the evolve commit
    assert _snap_dirs(store) == before
    head = store.read("blacklist")
    assert head.columns == ["url_hash", "note"]
    rows = head.collect()
    assert len(rows) == 8 and all(r["note"] is None for r in rows)
    # time travel keeps the schema-at-snapshot
    assert store.read("blacklist", snapshot_id=1).columns == ["url_hash"]


def test_lazy_migration_rewrites_only_dirty_buckets(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})
    store.evolve("blacklist", add=[("note", "string")])
    upd = spark.createDataFrame([(1, "seed"), (5, "feed")], "url_hash long, note string")
    plan = store.plan_merge("blacklist", upsert=upd, key="url_hash")
    assert plan.dirty == ["1"]  # keys 1,5 -> pmod 1
    store.commit({}, merge={"blacklist": plan})
    bm = store._bucket_map("blacklist")
    assert bm["1"].endswith("snap-00000003/__bucket=1")
    for b in ("0", "2", "3"):  # clean buckets carried by reference, old shape on disk
        assert bm[b].endswith(f"snap-00000001/__bucket={b}")
    got = {r["url_hash"]: r["note"] for r in store.read("blacklist").collect()}
    assert got[1] == "seed" and got[5] == "feed"
    assert all(got[k] is None for k in (0, 2, 3, 4, 6, 7))


def test_drop_column_and_time_travel(store, spark):
    store.commit({"blacklist": _bl(spark, [1, 2])})
    store.evolve("blacklist", add=[("note", "string")])
    store.evolve("blacklist", drop=["note"])
    assert store.read("blacklist").columns == ["url_hash"]
    assert store.read("blacklist", snapshot_id=2).columns == ["url_hash", "note"]


def test_evolve_validation(store, spark):
    store.commit({"blacklist": _bl(spark, [1])})
    with pytest.raises(ValueError):
        store.evolve("blacklist", drop=["url_hash"])  # bucket key protected
    with pytest.raises(ValueError):
        store.evolve("blacklist", add=[("url_hash", "long")])  # duplicate
    with pytest.raises(KeyError):
        store.evolve("blacklist", drop=["nope"])  # unknown


def test_never_evolved_manifest_has_no_schemas_key(store, spark):
    store.commit({"blacklist": _bl(spark, [1])})
    assert "schemas" not in store.current_manifest()


def test_evolution_survives_reopen(store, spark):
    store.commit({"blacklist": _bl(spark, [1])})
    store.evolve("blacklist", add=[("note", "string")])
    reopened = SnapshotStore(store.spark, store.root)
    assert [f.name for f in reopened.table_schema("blacklist")] == ["url_hash", "note"]
    assert reopened.read("blacklist").columns == ["url_hash", "note"]


def test_diff_across_evolution(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})          # sid 1
    store.evolve("blacklist", add=[("note", "string")])        # sid 2
    # a pure evolve changes no row: the pruned changelog is empty
    assert store.diff("blacklist", "url_hash", 1, 2).count() == 0
    upd = spark.createDataFrame([(1, "x")], "url_hash long, note string")
    store.commit({}, merge={"blacklist": store.plan_merge("blacklist", upsert=upd, key="url_hash")})
    d = store.diff("blacklist", "url_hash", 1, 3)              # spans the evolve
    assert d.columns == ["url_hash", "note", "_change_type"]
    got = {(r["url_hash"], r["_change_type"]): r["note"] for r in d.collect()}
    assert got == {(1, "update_before"): None, (1, "update_after"): "x"}


def test_compact_rewrites_in_evolved_shape(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})
    store.evolve("blacklist", add=[("note", "string")])
    store.compact("blacklist")
    bm = store._bucket_map("blacklist")
    assert all(p.endswith(f"snap-00000003/__bucket={b}") for b, p in bm.items())
    head = store.read("blacklist")
    assert head.columns == ["url_hash", "note"]
    assert head.count() == 8
    # pre-evolution snapshot still reads its own shape after the rewrite
    assert store.read("blacklist", snapshot_id=1).columns == ["url_hash"]


def test_empty_evolved_table_read(store, spark):
    store.commit({"blacklist": _bl(spark, [1])})
    store.evolve("robots", add=[("fetched_day", "int")])  # never-written table
    df = store.read("robots")
    assert "fetched_day" in df.columns and df.count() == 0


def test_added_column_participates_in_stats_pruning_safely(spark, tmp_path):
    # stats list a column old buckets lack: harvest records it unknown,
    # pruning must KEEP those buckets (optimization, never a bet)
    spec = {"blacklist": {"mode": "hash", "key": "url_hash", "n": 2, "stats": ["score"]}}
    store = SnapshotStore(spark, str(tmp_path / "evs"), bucket_spec=spec)
    store.commit({"blacklist": _bl(spark, range(4))})
    store.evolve("blacklist", add=[("score", "double")])
    upd = spark.createDataFrame([(0, 0.5)], "url_hash long, score double")
    store.commit({}, merge={"blacklist": store.plan_merge("blacklist", upsert=upd, key="url_hash")})
    out = store.read_where("blacklist", "score", lo=0.0)
    assert [r["url_hash"] for r in out.collect()] == [0]
