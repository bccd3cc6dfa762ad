"""Merge-on-read equality deletes (Iceberg v2 parity).

A bulk key purge writes ONE small delete file — no data bucket is
rewritten; readers subtract the keys with an anti-join. Deletes retire
per-bucket as normal CoW merges rewrite their buckets (re-inserted keys
stop being deleted — exactly the v2 sequence-number semantics, expressed
through the store's bucket/snapshot structure), and in bulk on
compact/rebucket. The CDC diff prunes to the keys' buckets; gc keeps
delete files referenced by retained manifests.
"""

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.tables import SnapshotStore, table_state_hash

SPEC4 = {"blacklist": {"mode": "hash", "key": "url_hash", "n": 4}}


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "mor"), bucket_spec=SPEC4)


def _bl(spark, keys):
    return spark.createDataFrame([(int(k),) for k in keys], "url_hash long")


def _snap_dirs(store):
    p = os.path.join(store.root, "data", "blacklist")
    return sorted(d for d in os.listdir(p) if not d.endswith("-del"))


def _pending(store):
    ent = store.current_manifest()["tables"]["blacklist"]
    return ent.get("deletes", [])


def test_mor_delete_writes_no_bucket(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})
    before = _snap_dirs(store)
    sid = store.mor_delete("blacklist", _bl(spark, [2, 5]))
    assert sid == 2
    assert _snap_dirs(store) == before  # zero data buckets rewritten
    assert sorted(r["url_hash"] for r in store.read("blacklist").collect()) == [0, 1, 3, 4, 6, 7]
    # time travel still sees the pre-delete state
    assert store.read("blacklist", snapshot_id=1).count() == 8


def test_mor_matches_cow_delete_content(spark, tmp_path):
    def build(tag, use_mor):
        st = SnapshotStore(spark, str(tmp_path / tag), bucket_spec=SPEC4)
        st.commit({"blacklist": _bl(spark, range(8))})
        doomed = _bl(spark, [1, 6])
        if use_mor:
            st.mor_delete("blacklist", doomed)
        else:
            plan = st.plan_merge("blacklist", delete=doomed, delete_key="url_hash")
            st.commit({}, merge={"blacklist": plan})
        return table_state_hash(st.read("blacklist"))

    assert build("mor", True) == build("cow", False)


def test_reinserted_key_survives_pending_delete(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})
    store.mor_delete("blacklist", _bl(spark, [1, 2]))  # buckets 1 and 2
    # a normal CoW merge re-inserts key 1 (bucket 1): the pending delete
    # for it must retire with the bucket rewrite
    plan = store.plan_merge("blacklist", upsert=_bl(spark, [1]), key="url_hash")
    assert plan.dirty == ["1"]
    store.commit({}, merge={"blacklist": plan})
    got = sorted(r["url_hash"] for r in store.read("blacklist").collect())
    assert got == [0, 1, 3, 4, 5, 6, 7]  # 1 is back, 2 still deleted
    # the pending file was consolidated down to the unresolved key
    dels = _pending(store)
    assert len(dels) == 1
    kdf = store.spark.read.parquet(os.path.join(store.root, dels[0]["path"]))
    assert [r["url_hash"] for r in kdf.collect()] == [2]


def test_deletes_fully_retire_when_their_buckets_rewrite(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})
    store.mor_delete("blacklist", _bl(spark, [2]))
    plan = store.plan_merge("blacklist", upsert=_bl(spark, [6]), key="url_hash")
    assert plan.dirty == ["2"]  # 6 pmod 4 == 2: same bucket as the delete
    store.commit({}, merge={"blacklist": plan})
    assert _pending(store) == []
    assert sorted(r["url_hash"] for r in store.read("blacklist").collect()) == [0, 1, 3, 4, 5, 6, 7]


def test_compact_retires_all_deletes(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})
    store.mor_delete("blacklist", _bl(spark, [3]))
    store.compact("blacklist")
    assert _pending(store) == []
    assert sorted(r["url_hash"] for r in store.read("blacklist").collect()) == [0, 1, 2, 4, 5, 6, 7]


def test_diff_prunes_to_delete_key_buckets(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})          # sid 1
    store.mor_delete("blacklist", _bl(spark, [5]))             # sid 2; 5 -> bucket 1
    assert store.changed_buckets("blacklist", 1, 2) == ["1"]
    d = store.diff("blacklist", "url_hash", 1, 2)
    got = [(r["url_hash"], r["_change_type"]) for r in d.collect()]
    assert got == [(5, "delete")]


def test_gc_keeps_referenced_delete_files(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})
    store.mor_delete("blacklist", _bl(spark, [2]))
    store.commit({}, properties={"noop": 1})
    store.commit({}, properties={"noop": 2})
    store.gc(keep_last=2)
    # HEAD still applies the delete after expiry of older snapshots
    assert sorted(r["url_hash"] for r in store.read("blacklist").collect()) == [0, 1, 3, 4, 5, 6, 7]


def test_gc_reclaims_retired_delete_files(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})
    store.mor_delete("blacklist", _bl(spark, [2]))
    store.compact("blacklist")
    store.commit({}, properties={"noop": 1})
    store.commit({}, properties={"noop": 2})
    store.gc(keep_last=2)
    tdir = os.path.join(store.root, "data", "blacklist")
    assert not any(d.endswith("-del") for d in os.listdir(tdir))


def test_mor_delete_validation(store, spark):
    with pytest.raises(ValueError):
        store.mor_delete("blacklist", _bl(spark, [1]))  # no data yet
    store.commit({"blacklist": _bl(spark, range(4))})
    with pytest.raises(KeyError):
        store.mor_delete("robots", _bl(spark, [1]))  # unbucketed table
    plan = store.plan_merge("blacklist", upsert=_bl(spark, [0]), key="url_hash")
    with pytest.raises(ValueError):  # one table, two commit modes
        store.commit(
            {}, merge={"blacklist": plan}, _mor_delete={"blacklist": _bl(spark, [1])}
        )


# -- delete-file compaction policy -------------------------------------------


def test_delete_files_fold_at_threshold(spark, tmp_path):
    st = SnapshotStore(
        spark, str(tmp_path / "fold"), bucket_spec=SPEC4, mor_delete_max_files=3
    )
    st.commit({"blacklist": _bl(spark, range(16))})
    for k in (1, 2, 3):
        st.mor_delete("blacklist", _bl(spark, [k]))
    ent = st.current_manifest()["tables"]["blacklist"]
    assert len(ent["deletes"]) == 3  # at threshold, not yet folded
    st.mor_delete("blacklist", _bl(spark, [4]))  # trips the fold
    ent = st.current_manifest()["tables"]["blacklist"]
    assert len(ent["deletes"]) == 1  # 4 files -> 1 consolidated
    kdf = st.spark.read.parquet(os.path.join(st.root, ent["deletes"][0]["path"]))
    assert sorted(r["url_hash"] for r in kdf.collect()) == [1, 2, 3, 4]
    assert sorted(r["url_hash"] for r in st.read("blacklist").collect()) == [
        0, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    ]
    # time travel BEFORE the fold still reads through the unfolded files
    assert st.read("blacklist", snapshot_id=4).count() == 13


def test_fold_is_semantics_free(spark, tmp_path):
    def build(tag, threshold):
        st = SnapshotStore(
            spark, str(tmp_path / tag), bucket_spec=SPEC4,
            mor_delete_max_files=threshold,
        )
        st.commit({"blacklist": _bl(spark, range(16))})
        for k in (1, 2, 5, 9, 10):
            st.mor_delete("blacklist", _bl(spark, [k]))
        return table_state_hash(st.read("blacklist"))

    assert build("folded", 2) == build("unfolded", 100)


def test_folded_deletes_retire_on_bucket_rewrite(spark, tmp_path):
    st = SnapshotStore(
        spark, str(tmp_path / "foldret"), bucket_spec=SPEC4, mor_delete_max_files=1
    )
    st.commit({"blacklist": _bl(spark, range(8))})
    st.mor_delete("blacklist", _bl(spark, [1]))   # bucket 1
    st.mor_delete("blacklist", _bl(spark, [2]))   # folds -> one file {1, 2}
    assert len(_pending_of(st)) == 1
    # rewrite bucket 1: key 1 retires (and is re-inserted), key 2 stays
    plan = st.plan_merge("blacklist", upsert=_bl(spark, [1]), key="url_hash")
    assert plan.dirty == ["1"]
    st.commit({}, merge={"blacklist": plan})
    dels = _pending_of(st)
    assert len(dels) == 1
    kdf = st.spark.read.parquet(os.path.join(st.root, dels[0]["path"]))
    assert [r["url_hash"] for r in kdf.collect()] == [2]
    got = sorted(r["url_hash"] for r in st.read("blacklist").collect())
    assert got == [0, 1, 3, 4, 5, 6, 7]


def _pending_of(st):
    return (st.current_manifest()["tables"]["blacklist"]).get("deletes", [])


def test_merged_full_sees_pending_deletes_on_clean_slice(store, spark):
    store.commit({"blacklist": _bl(spark, range(8))})
    store.mor_delete("blacklist", _bl(spark, [3]))  # bucket 3, stays clean
    plan = store.plan_merge("blacklist", upsert=_bl(spark, [0]), key="url_hash")
    full = store.merged_full(plan)
    assert sorted(r["url_hash"] for r in full.collect()) == [0, 1, 2, 4, 5, 6, 7]
