"""SnapshotStore: atomic commits, time travel, MERGE join-rewrites."""

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.schemas import POLITENESS
from crawler_spark.tables import (
    SnapshotStore,
    merge_delete,
    merge_update_cols,
    merge_upsert,
    table_state_hash,
)


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "store"))


def _pol(spark, rows):
    return spark.createDataFrame(rows, POLITENESS)


def test_empty_read_has_schema(store):
    df = store.read("frontier")
    assert df.count() == 0
    assert "url_hash" in df.columns


def test_commit_and_read(store, spark):
    df = _pol(spark, [(1, 0, 10, 0, 100), (2, 3, 20, 0, 100)])
    sid = store.commit({"politeness": df})
    assert sid == 1
    out = store.read("politeness")
    assert out.count() == 2


def test_carry_forward_and_time_travel(store, spark):
    store.commit({"politeness": _pol(spark, [(1, 0, 10, 0, 100)])})
    store.commit({"blacklist": spark.createDataFrame([(99,)], "url_hash long")})
    # politeness carried forward into snapshot 2
    assert store.read("politeness").count() == 1
    store.commit({"politeness": _pol(spark, [(1, 5, 10, 0, 100), (2, 0, 9, 0, 50)])})
    assert store.read("politeness").count() == 2
    assert store.read("politeness", snapshot_id=1).count() == 1
    assert store.read("politeness", snapshot_id=2).count() == 1


def test_head_is_atomic_pointer(store, spark):
    store.commit({"politeness": _pol(spark, [(1, 0, 10, 0, 100)])})
    head = os.path.join(store.root, "HEAD")
    with open(head) as f:
        assert f.read().strip() == "manifest-00000001.json"


def test_properties_accumulate(store, spark):
    store.commit({}, properties={"batch_id": 1})
    store.commit({}, properties={"watermark_epoch": 42})
    p = store.properties()
    assert p["batch_id"] == 1 and p["watermark_epoch"] == 42


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    upd = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    out = {r["k"]: r["v"] for r in merge_upsert(base, upd, "k").collect()}
    assert out == {1: "a", 2: "B", 3: "C"}


def test_merge_upsert_composite_key(spark):
    base = spark.createDataFrame([(1, 10, "a"), (1, 11, "b")], "k long, d int, v string")
    upd = spark.createDataFrame([(1, 11, "B"), (2, 10, "C")], "k long, d int, v string")
    out = {(r["k"], r["d"]): r["v"] for r in merge_upsert(base, upd, ["k", "d"]).collect()}
    assert out == {(1, 10): "a", (1, 11): "B", (2, 10): "C"}


def test_merge_update_cols_partial(spark):
    base = spark.createDataFrame([(1, "a", 5), (2, "b", 6)], "k long, v string, n int")
    upd = spark.createDataFrame([(2, "B")], "k long, v string")
    rows = {r["k"]: (r["v"], r["n"]) for r in merge_update_cols(base, upd, "k").collect()}
    assert rows == {1: ("a", 5), 2: ("B", 6)}  # n untouched, no insert


def test_merge_delete(spark):
    base = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    doomed = spark.createDataFrame([(2,)], "k long")
    assert {r["k"] for r in merge_delete(base, doomed, "k").collect()} == {1, 3}


def test_state_hash_order_independent(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "k long, v string").repartition(3)
    assert table_state_hash(a) == table_state_hash(b)
    c = spark.createDataFrame([(1, "x"), (2, "z")], "k long, v string")
    assert table_state_hash(a) != table_state_hash(c)


def test_gc_retention(store, spark):
    for i in range(4):
        store.commit({"politeness": _pol(spark, [(i, 0, 10, 0, 100)])})
    store.commit({"blacklist": spark.createDataFrame([(9,)], "url_hash long")})
    # snapshot 5 carries politeness snap-4 forward; gc keeps last 2
    out = store.gc(keep_last=2)
    assert out["removed_manifests"] == 3
    # HEAD still reads: carried-forward politeness dir must survive
    assert store.read("politeness").count() == 1
    assert store.read("blacklist").count() == 1
    assert store.read("politeness", snapshot_id=4).count() == 1
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        store.manifest_at(2)


def test_append_mode_log(store, spark):
    from crawler_spark.schemas import SNAPSHOTS_LOG

    def row(i):
        return spark.createDataFrame([(i, i, None, "frontier", "", 1, 0, None)], SNAPSHOTS_LOG)

    for i in range(3):
        store.commit({}, append={"snapshots_log": row(i)})
    log = store.read("snapshots_log")
    assert sorted(r["snapshot_id"] for r in log.collect()) == [0, 1, 2]
    # time travel sees the prefix
    assert store.read("snapshots_log", snapshot_id=2).count() == 2
    # gc keeps every delta the retained manifests reference
    store.gc(keep_last=1)
    assert sorted(r["snapshot_id"] for r in store.read("snapshots_log").collect()) == [0, 1, 2]
    import pytest as _p
    with _p.raises(ValueError):
        store.commit({"snapshots_log": row(9)}, append={"snapshots_log": row(9)})


def test_compact_collapses_deltas(store, spark):
    from crawler_spark.schemas import SNAPSHOTS_LOG

    def row(i):
        return spark.createDataFrame([(i, i, None, "frontier", "", 1, 0, None)], SNAPSHOTS_LOG)

    for i in range(4):
        store.commit({}, append={"snapshots_log": row(i)})
    ent = store.current_manifest()["tables"]["snapshots_log"]
    assert len(ent["paths"]) == 4
    store.compact("snapshots_log")
    ent2 = store.current_manifest()["tables"]["snapshots_log"]
    assert "paths" not in ent2  # single dir again
    assert sorted(r["snapshot_id"] for r in store.read("snapshots_log").collect()) == [0, 1, 2, 3]
    # appends continue on top of the compacted base
    store.commit({}, append={"snapshots_log": row(9)})
    assert store.read("snapshots_log").count() == 5


def test_crash_mid_commit_leaves_head_intact(store, spark):
    """A crash between data write and HEAD swap must be invisible: HEAD
    still reads the previous complete snapshot, orphans are garbage not
    corruption, and the next commit reclaims the orphan manifest name."""
    import json

    store.commit({"politeness": _pol(spark, [(1, 0, 10, 0, 100)])})
    # simulate: writer crashed after writing data dir + manifest-2, before
    # swapping HEAD
    orphan_data = os.path.join(store.root, "data", "politeness", "snap-00000002")
    os.makedirs(orphan_data, exist_ok=True)
    with open(os.path.join(store.root, "manifests", "manifest-00000002.json"), "w") as f:
        json.dump({"snapshot_id": 2, "tables": {"politeness": {"path": "garbage"}},
                   "properties": {}}, f)
    # reader unaffected
    assert store.snapshot_id == 1
    assert store.read("politeness").count() == 1
    # next commit takes sid=2, atomically replacing the orphan manifest
    sid = store.commit({"politeness": _pol(spark, [(1, 1, 10, 0, 100), (2, 0, 5, 0, 50)])})
    assert sid == 2
    assert store.read("politeness").count() == 2


def test_partitioned_write(store, spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 20240101, 2024, 1, 1, None, 5, 6), (2, 20240102, 2024, 1, 2, None, 7, 8)],
        store.read("metrics_daily").schema,
    )
    store.commit({"metrics_daily": df}, partition_by={"metrics_daily": ["yyyymmdd"]})
    path = os.path.join(store.root, "data", "metrics_daily", "snap-00000001")
    assert any(p.startswith("yyyymmdd=") for p in os.listdir(path))
    assert store.read("metrics_daily").filter(F.col("yyyymmdd") == 20240101).count() == 1
