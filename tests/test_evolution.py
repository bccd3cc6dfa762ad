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


# -- type widening (Iceberg ALTER COLUMN TYPE promotions) -------------------

SPECP = {"politeness": {"mode": "hash", "key": "host_hash", "n": 4}}
_POL_DDL = "host_hash long, used_quota int, daily_quota int, quota_day int, min_delay_ms int"


def _pol(spark, rows):
    return spark.createDataFrame(rows, _POL_DDL)


def _file_type(store, bucket_rel, col):
    """Physical parquet type of `col` in a bucket dir (footer truth)."""
    import pyarrow.parquet as pq

    d = os.path.join(store.root, bucket_rel)
    f = sorted(p for p in os.listdir(d) if p.endswith(".parquet"))[0]
    return str(pq.read_schema(os.path.join(d, f)).field(col).type)


def test_widen_is_metadata_only_and_promotes_old_files(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "w1"), bucket_spec=SPECP)
    store.commit({"politeness": _pol(spark, [(1, 7, 100, 0, 50), (2, 9, 100, 0, 50)])})
    sid = store.evolve("politeness", widen=[("used_quota", "bigint")])
    assert sid == 2
    # no data rewritten: the old bucket files still carry int32 on disk
    bm = store._bucket_map("politeness")
    assert all(p.endswith(f"snap-00000001/__bucket={b}") for b, p in bm.items())
    assert _file_type(store, bm["1"], "used_quota") == "int32"
    head = store.read("politeness")
    assert dict(head.dtypes)["used_quota"] == "bigint"
    assert {r["host_hash"]: r["used_quota"] for r in head.collect()} == {1: 7, 2: 9}
    # time travel returns the schema-at-snapshot (still int)
    old = store.read("politeness", snapshot_id=1)
    assert dict(old.dtypes)["used_quota"] == "int"


def test_widen_mixed_generations_read_as_one_type(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "w2"), bucket_spec=SPECP)
    store.commit({"politeness": _pol(spark, [(h, h * 10, 100, 0, 50) for h in range(8)])})
    store.evolve("politeness", widen=[("used_quota", "bigint")])
    # the caller's frame may still carry the narrow type: the write path
    # casts to schema-at-HEAD, so the new bucket lands as int64
    upd = spark.createDataFrame(
        [(1, 2**31 + 5, 100, 0, 50)],
        "host_hash long, used_quota bigint, daily_quota int, quota_day int, min_delay_ms int",
    )  # a value only the WIDE type can hold — the point of the promotion
    plan = store.plan_merge("politeness", upsert=upd, key="host_hash")
    assert plan.dirty == ["1"]
    store.commit({}, merge={"politeness": plan})
    bm = store._bucket_map("politeness")
    assert _file_type(store, bm["1"], "used_quota") == "int64"   # new generation
    assert _file_type(store, bm["0"], "used_quota") == "int32"   # old generation
    got = {r["host_hash"]: r["used_quota"] for r in store.read("politeness").collect()}
    assert got[1] == 2**31 + 5 and got[0] == 0 and got[5] == 50


def test_widen_bucket_key_routing_stable(spark, tmp_path):
    spec = {"metrics_daily": {"mode": "hash", "key": "yyyymmdd", "n": 4}}
    store = SnapshotStore(spark, str(tmp_path / "w3"), bucket_spec=spec)
    rows = [(h, 20240100 + h, 2024, 1, h, None, 0, 0) for h in range(8)]
    ddl = ("url_hash long, yyyymmdd int, year int, month int, day int, "
           "ts timestamp, views long, subscribers long")
    store.commit({"metrics_daily": spark.createDataFrame(rows, ddl)})
    before = store._bucket_map("metrics_daily")
    store.evolve("metrics_daily", widen=[("yyyymmdd", "bigint")])
    # pmod routing is numeric — a widened integral key keeps every label
    upd = spark.createDataFrame([(99, 20240101, 2024, 1, 1, None, 5, 5)], ddl)
    plan = store.plan_merge("metrics_daily", upsert=upd, key=["url_hash", "yyyymmdd"])
    assert plan.dirty == [str(20240101 % 4)]
    store.commit({}, merge={"metrics_daily": plan})
    after = store._bucket_map("metrics_daily")
    assert set(after) == set(before)  # no bucket moved or split
    assert store.read("metrics_daily").filter(F.col("yyyymmdd") == 20240101).count() == 2


def test_widen_validation(store, spark):
    store.commit({"blacklist": _bl(spark, [1])})
    with pytest.raises(ValueError):
        store.evolve("blacklist", widen=[("url_hash", "int")])  # narrowing
    with pytest.raises(KeyError):
        store.evolve("blacklist", widen=[("nope", "bigint")])  # unknown
    store.evolve("blacklist", add=[("x", "int")])
    with pytest.raises(KeyError):
        # widen of a column dropped in the same evolve
        store.evolve("blacklist", drop=["x"], widen=[("x", "bigint")])


def test_widen_float_to_double_exact(store, spark):
    store.commit({"blacklist": _bl(spark, [1, 2])})
    store.evolve("blacklist", add=[("score", "float")])
    upd = spark.createDataFrame([(1, 1.5), (2, 2.25)], "url_hash long, score float")
    store.commit({}, merge={"blacklist": store.plan_merge("blacklist", upsert=upd, key="url_hash")})
    store.evolve("blacklist", widen=[("score", "double")])
    head = store.read("blacklist")
    assert dict(head.dtypes)["score"] == "double"
    got = {r["url_hash"]: r["score"] for r in head.collect()}
    assert got == {1: 1.5, 2: 2.25}  # f32-exact values promote losslessly


def test_widen_diff_speaks_to_side_type(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "w4"), bucket_spec=SPECP)
    store.commit({"politeness": _pol(spark, [(1, 7, 100, 0, 50)])})      # sid 1
    store.evolve("politeness", widen=[("used_quota", "bigint")])         # sid 2
    assert store.diff("politeness", "host_hash", 1, 2).count() == 0
    upd = _pol(spark, [(1, 8, 100, 0, 50)])
    store.commit({}, merge={"politeness": store.plan_merge("politeness", upsert=upd, key="host_hash")})
    d = store.diff("politeness", "host_hash", 1, 3)
    assert dict(d.dtypes)["used_quota"] == "bigint"  # to-side schema
    got = {r["_change_type"]: r["used_quota"] for r in d.collect()}
    assert got == {"update_before": 7, "update_after": 8}


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
