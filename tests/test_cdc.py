"""CDC changelog scan: cdc_diff row classification + SnapshotStore.diff's
changed-bucket pruning (Iceberg changelog / Delta CDF semantics over the
CoW snapshot store)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.schemas import POLITENESS
from crawler_spark.tables import SnapshotStore, cdc_diff

SPEC = {"politeness": {"mode": "hash", "key": "host_hash", "n": 4}}


@pytest.fixture()
def cdc_store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "cdc"), bucket_spec=SPEC)


def _pol(spark, rows):
    """rows: (host_hash, used_quota) pairs padded to the full schema."""
    return spark.createDataFrame(
        [(int(h), int(u), 100, 20240101, 250) for h, u in rows], POLITENESS
    )


def _chg(df):
    return sorted(
        (r["host_hash"], r["_change_type"], r["used_quota"]) for r in df.collect()
    )


def test_cdc_diff_classification(spark):
    old = _pol(spark, [(1, 10), (2, 20), (3, 30)])
    new = _pol(spark, [(2, 20), (3, 33), (4, 40)])
    out = _chg(cdc_diff(old, new, "host_hash"))
    # unchanged key 2 emits nothing; update emits before+after images
    assert out == [
        (1, "delete", 10),
        (3, "update_after", 33),
        (3, "update_before", 30),
        (4, "insert", 40),
    ]


def test_cdc_diff_null_values_are_nullsafe(spark):
    rows_old = [(1, None, 100, 20240101, 250), (2, None, 100, 20240101, 250)]
    rows_new = [(1, None, 100, 20240101, 250), (2, 5, 100, 20240101, 250)]
    old = spark.createDataFrame(rows_old, POLITENESS)
    new = spark.createDataFrame(rows_new, POLITENESS)
    out = _chg(cdc_diff(old, new, "host_hash"))
    # NULL == NULL under eqNullSafe (key 1 unchanged); NULL -> 5 is an update
    assert out == [(2, "update_after", 5), (2, "update_before", None)]


def test_cdc_diff_identical_frames_empty(spark):
    df = _pol(spark, [(1, 10), (2, 20)])
    assert cdc_diff(df, df, "host_hash").count() == 0


def test_store_diff_prunes_to_changed_buckets(cdc_store, spark):
    # snap 1: keys 0..7 -> buckets 0..3 (pmod 4)
    cdc_store.commit({"politeness": _pol(spark, [(k, 10 * k) for k in range(8)])})
    # snap 2: a batch touching ONLY bucket 1 — update key 1, insert key 9
    plan = cdc_store.plan_merge(
        "politeness", upsert=_pol(spark, [(1, 99), (9, 90)]), key="host_hash"
    )
    assert plan.dirty == ["1"]
    cdc_store.commit({}, merge={"politeness": plan})

    assert cdc_store.changed_buckets("politeness", 1, 2) == ["1"]
    pruned = _chg(cdc_store.diff("politeness", "host_hash", 1, 2))
    # pruned diff == brute-force diff over the FULL snapshots
    brute = _chg(
        cdc_diff(
            cdc_store.read("politeness", snapshot_id=1),
            cdc_store.read("politeness", snapshot_id=2),
            "host_hash",
        )
    )
    assert pruned == brute
    assert pruned == [
        (1, "update_after", 99),
        (1, "update_before", 10),
        (9, "insert", 90),
    ]


def test_store_diff_from_empty_initial_snapshot(cdc_store, spark):
    cdc_store.commit({"politeness": _pol(spark, [(1, 10), (2, 20)])})
    out = _chg(cdc_store.diff("politeness", "host_hash", 0, 1))
    assert out == [(1, "insert", 10), (2, "insert", 20)]


def test_store_diff_sees_bucket_drop_as_deletes(cdc_store, spark):
    cdc_store.commit({"politeness": _pol(spark, [(2, 20), (6, 60), (3, 30)])})
    plan = cdc_store.plan_merge(
        "politeness",
        delete=_pol(spark, [(2, 0), (6, 0)]),
        delete_key="host_hash",
    )
    cdc_store.commit({}, merge={"politeness": plan})
    # bucket 2 emptied out of the manifest entirely -> still diffs as deletes
    assert cdc_store.changed_buckets("politeness", 1, 2) == ["2"]
    out = _chg(cdc_store.diff("politeness", "host_hash", 1, 2))
    assert out == [(2, "delete", 20), (6, "delete", 60)]


def test_changelog_replay_reconstructs_loop_frontier(spark, tmp_path):
    """old snapshot + changelog == new snapshot, on the ENGINE's own
    frontier across real crawl batches (inserts from discovery, updates
    from fetch write-backs — every change type the loop produces)."""
    from crawler_spark.streaming.scheduler import CrawlScheduler
    from crawler_spark.tables import table_state_hash

    eng = CrawlScheduler(
        spark, str(tmp_path / "cdcloop"), universe=300, n_seeds=8,
        k_per_host=4, tick_secs=6 * 3600, use_sketch=False,
        lineage_hashes=False,
    )
    eng.init()
    for _ in range(3):
        eng.run_batch()
    st = eng.store
    a, b = 1, st.snapshot_id
    assert b > a
    diff = st.diff("frontier", "url_hash", a, b)
    # pruned diff == brute-force diff over the full snapshots
    brute = cdc_diff(
        st.read("frontier", snapshot_id=a),
        st.read("frontier", snapshot_id=b),
        "url_hash",
    )
    key = lambda r: (r["url_hash"], r["_change_type"])  # noqa: E731
    assert sorted(map(key, diff.collect())) == sorted(map(key, brute.collect()))
    # replay: apply the changelog to the old snapshot -> the new snapshot
    ins = diff.filter(
        F.col("_change_type").isin("insert", "update_after")
    ).drop("_change_type")
    rem = diff.filter(
        F.col("_change_type").isin("delete", "update_before")
    ).select("url_hash")
    new = st.read("frontier", snapshot_id=b)
    replayed = (
        st.read("frontier", snapshot_id=a)
        .join(rem, "url_hash", "left_anti")
        .unionByName(ins)
        .select(*new.columns)  # USING-join moved the key column to front
    )
    assert table_state_hash(replayed) == table_state_hash(new)


def test_store_diff_unbucketed_table_falls_back_to_full(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "plain"))
    store.commit({"politeness": _pol(spark, [(1, 10), (2, 20)])})
    store.commit({"politeness": _pol(spark, [(1, 11), (3, 30)])})
    out = _chg(store.diff("politeness", "host_hash", 1, 2))
    assert out == [
        (1, "update_after", 11),
        (1, "update_before", 10),
        (2, "delete", 20),
        (3, "insert", 30),
    ]


def _view(df):
    """A row-local materialized view: filter + project (keeps the key)."""
    return df.filter(F.col("used_quota") >= 25).select("host_hash", "used_quota")


def test_apply_cdc_transformed_view_updates_in_and_out(spark):
    from crawler_spark.tables import apply_cdc

    old = _pol(spark, [(1, 10), (2, 30), (3, 30)])
    # key 1 enters the view via update, key 3 leaves via update,
    # key 4 inserts in-view, key 5 inserts out-of-view, key 2 unchanged
    new = _pol(spark, [(1, 40), (2, 30), (3, 5), (4, 50), (5, 7)])
    mat = apply_cdc(
        _view(old), cdc_diff(old, new, "host_hash"), "host_hash", transform=_view
    )
    got = sorted((r.host_hash, r.used_quota) for r in mat.collect())
    want = sorted((r.host_hash, r.used_quota) for r in _view(new).collect())
    assert got == want == [(1, 40), (2, 30), (4, 50)]


def test_apply_cdc_delete_purges_view_rows(spark):
    from crawler_spark.tables import apply_cdc

    old = _pol(spark, [(1, 30), (2, 30)])
    new = _pol(spark, [(2, 30)])
    mat = apply_cdc(
        _view(old), cdc_diff(old, new, "host_hash"), "host_hash", transform=_view
    )
    assert [(r.host_hash, r.used_quota) for r in mat.collect()] == [(2, 30)]


def test_incremental_view_tracks_loop_corpus(spark, tmp_path):
    """A derived corpus export (landscape images, projected columns)
    maintained ONLY from per-snapshot changelogs across real crawl
    batches is bit-identical to recomputing the view from the live
    table — the O(changed rows) downstream-consumer contract."""
    from crawler_spark.streaming.scheduler import CrawlScheduler
    from crawler_spark.tables import apply_cdc, table_state_hash

    def view(df):
        return df.filter(F.col("w") >= F.col("h")).select(
            "image_id", "w", "h", "fmt", "caption"
        )

    eng = CrawlScheduler(
        spark, str(tmp_path / "mvloop"), universe=300, n_seeds=8,
        k_per_host=4, tick_secs=6 * 3600, use_sketch=False,
        lineage_hashes=False,
    )
    eng.init()
    st = eng.store
    sids = [st.snapshot_id]
    for _ in range(3):
        eng.run_batch()
        sids.append(st.snapshot_id)
    mat = view(st.read("corpus", snapshot_id=sids[0]))
    for a, b in zip(sids, sids[1:]):
        mat = apply_cdc(
            mat, st.diff("corpus", "image_id", a, b), "image_id", transform=view
        )
    full = view(st.read("corpus"))
    assert mat.count() > 0
    assert table_state_hash(mat) == table_state_hash(full)
