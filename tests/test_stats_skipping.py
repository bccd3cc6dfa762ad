"""Manifest column stats + data skipping: per-bucket min/max harvested
from parquet footers at commit time (Iceberg manifest stats), range reads
pruned to buckets whose stats can intersect — stale/missing stats cost
speed, never correctness."""

import datetime

import pytest

from crawler_spark.schemas import POLITENESS, SEEN
from crawler_spark.tables import SnapshotStore

SPEC = {
    "politeness": {"mode": "hash", "key": "host_hash", "n": 4, "stats": ["used_quota"]},
    "seen": {"mode": "hash", "key": "url_hash", "n": 4, "stats": ["decided_at_ts"]},
}


@pytest.fixture()
def sstore(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "stats"), bucket_spec=SPEC)


def _pol(spark, rows):
    return spark.createDataFrame(
        [(int(h), u if u is None else int(u), 100, 20240101, 250) for h, u in rows],
        POLITENESS,
    )


def _ts(day):
    return datetime.datetime(2024, 1, day)


def _seen(spark, rows):
    return spark.createDataFrame(
        [(int(k), int(k) % 4, "accepted", _ts(d)) for k, d in rows], SEEN
    )


def test_stats_recorded_match_actual_minmax(sstore, spark):
    # keys 0..7 -> buckets 0..3 (pmod 4); bucket b holds quotas 10b, 10b+40
    sstore.commit({"politeness": _pol(spark, [(k, 10 * k) for k in range(8)])})
    stats = sstore.table_stats("politeness")
    assert stats == {
        str(b): {"used_quota": [10 * b, 10 * b + 40]} for b in range(4)
    }


def test_pruned_labels_and_read_where_identity(sstore, spark):
    sstore.commit({"politeness": _pol(spark, [(k, 10 * k) for k in range(8)])})
    # range [0, 15] can only live in buckets 0 (min 0) and 1 (min 10)
    assert sstore.pruned_labels("politeness", "used_quota", 0, 15) == ["0", "1"]
    got = sorted(
        r["host_hash"]
        for r in sstore.read_where("politeness", "used_quota", 0, 15).collect()
    )
    want = sorted(
        r["host_hash"]
        for r in sstore.read("politeness")
        .filter("used_quota >= 0 AND used_quota <= 15")
        .collect()
    )
    assert got == want == [0, 1]
    # open-ended bounds prune too
    assert sstore.pruned_labels("politeness", "used_quota", lo=60) == ["2", "3"]
    assert sstore.pruned_labels("politeness", "used_quota", hi=5) == ["0"]


def test_timestamp_stats_prune_future_buckets(sstore, spark):
    # bucket b gets decided_at_ts = Jan (b+1) and Jan (b+5)
    rows = [(k, k % 4 + 1) for k in range(8, 16)]  # keys 8..15 -> buckets 0..3
    rows = [(k, (k % 4) + 1) for k in range(8)] + [(k + 8, (k % 4) + 5) for k in range(8)]
    sstore.commit({"seen": _seen(spark, rows)})
    # as-of Jan 2: only buckets whose min ts <= Jan 2 survive (buckets 0, 1)
    labels = sstore.pruned_labels("seen", "decided_at_ts", hi=_ts(2))
    assert labels == ["0", "1"]
    got = sorted(
        r["url_hash"]
        for r in sstore.read_where("seen", "decided_at_ts", hi=_ts(2)).collect()
    )
    want = sorted(
        r["url_hash"]
        for r in sstore.read("seen")
        .filter(f"decided_at_ts <= TIMESTAMP '2024-01-02'")
        .collect()
    )
    assert got == want


def test_merge_updates_dirty_bucket_stats_and_carries_clean(sstore, spark):
    sstore.commit({"politeness": _pol(spark, [(k, 10 * k) for k in range(8)])})
    before = sstore.table_stats("politeness")
    # dirty only bucket 1: key 1 -> quota 999
    plan = sstore.plan_merge("politeness", upsert=_pol(spark, [(1, 999)]), key="host_hash")
    assert plan.dirty == ["1"]
    sstore.commit({}, merge={"politeness": plan})
    after = sstore.table_stats("politeness")
    assert after["1"] == {"used_quota": [50, 999]}  # keys 1, 5 -> 999, 50
    for b in ("0", "2", "3"):
        assert after[b] == before[b]
    # stats are snapshot-scoped (time travel sees the old bounds)
    assert sstore.table_stats("politeness", snapshot_id=1) == before


def test_all_null_column_bucket_is_never_pruned(sstore, spark):
    # bucket 3 (keys 3, 7) holds only NULL quotas -> no usable stat
    rows = [(k, 10 * k) for k in range(8) if k % 4 != 3] + [(3, None), (7, None)]
    sstore.commit({"politeness": _pol(spark, rows)})
    assert "3" not in sstore.table_stats("politeness")
    # unknown stats keep the bucket through any range...
    assert "3" in sstore.pruned_labels("politeness", "used_quota", 0, 5)
    # ...and the predicate still applies to what is read (NULLs drop)
    got = sorted(
        r["host_hash"]
        for r in sstore.read_where("politeness", "used_quota", 0, 5).collect()
    )
    assert got == [0]


def test_unbucketed_table_read_where_falls_back(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "plain"))
    store.commit({"politeness": _pol(spark, [(1, 10), (2, 20)])})
    assert store.pruned_labels("politeness", "used_quota", 0, 15) is None
    got = [r["host_hash"] for r in store.read_where("politeness", "used_quota", 0, 15).collect()]
    assert got == [1]


# ---------------------------------------------------------------------------
# write sort order (Iceberg table sort order): the spec's `sort` columns
# cluster each bucket's files so parquet row-group/page stats on those
# columns are tight — the in-file complement of manifest-stats pruning
# ---------------------------------------------------------------------------


def test_sort_spec_clusters_files_without_changing_content(spark, tmp_path):
    import os

    import pyarrow.parquet as pq

    from crawler_spark.tables import table_state_hash

    rows = [(k, (k * 37) % 50) for k in range(64)]  # quota scrambled vs key
    specs = {
        "plain": {"politeness": {"mode": "hash", "key": "host_hash", "n": 4}},
        "sorted": {
            "politeness": {
                "mode": "hash", "key": "host_hash", "n": 4, "sort": ["used_quota"]
            }
        },
    }
    hashes, monotone = {}, {}
    for name, spec in specs.items():
        st = SnapshotStore(spark, str(tmp_path / name), bucket_spec=spec)
        st.commit({"politeness": _pol(spark, rows)})
        hashes[name] = table_state_hash(st.read("politeness"))
        ok = []
        for lbl, rel in st._bucket_map("politeness").items():
            d = os.path.join(st.root, rel)
            for fn in sorted(os.listdir(d)):
                if not fn.endswith(".parquet"):
                    continue
                col = pq.read_table(os.path.join(d, fn), columns=["used_quota"])
                vals = col.column("used_quota").to_pylist()
                ok.append(vals == sorted(vals))
        monotone[name] = all(ok)
    # layout-only: identical content either way …
    assert hashes["plain"] == hashes["sorted"]
    # … but the sort spec makes every file one sorted run (tight,
    # disjoint row-group stats for the scan's pushed range predicate);
    # the scrambled input proves plain writes do NOT get this for free
    assert monotone["sorted"] and not monotone["plain"]


def test_sorted_frontier_pop_parity_with_default_spec(spark, tmp_path):
    # the crawl spec now sorts frontier files by next_fetch_ts; a CoW
    # merge through the sorted layout must keep bit-identical content
    from crawler_spark.tables import crawl_bucket_spec, table_state_hash

    def build(tag, spec):
        st = SnapshotStore(spark, str(tmp_path / f"fp_{tag}"), bucket_spec=spec)
        base = _seen(spark, [(k, 1 + k % 20) for k in range(40)])
        st.commit({"seen": base})
        upd = _seen(spark, [(3, 25), (7, 26)])
        st.commit({}, merge={"seen": st.plan_merge("seen", upsert=upd, key="url_hash")})
        return table_state_hash(st.read("seen"))

    sortspec = {
        "seen": {"mode": "hash", "key": "url_hash", "n": 4, "sort": ["decided_at_ts"]}
    }
    plainspec = {"seen": {"mode": "hash", "key": "url_hash", "n": 4}}
    assert build("sorted", sortspec) == build("plain", plainspec)
    assert "sort" in crawl_bucket_spec()["frontier"]
