"""Blacklist cascade (S13/S14) and seen-set removal with sketch updates
(Bloom rebuild / cuckoo in-place delete)."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators import seen
from crawler_spark.schemas import SEEN
from crawler_spark.streaming.scheduler import CrawlScheduler

PARAMS = dict(universe=400, n_seeds=10, k_per_host=4, tick_secs=6 * 3600)


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_remove_from_seen_sketch_consistency(spark, kind):
    seen_tbl = spark.createDataFrame(
        [(i, int(i % 4), "accepted", None) for i in range(60)], SEEN
    )
    sketches = seen.build_sketches(seen_tbl, n_shards=4, kind=kind)
    doomed = spark.createDataFrame([(i,) for i in range(0, 60, 3)], "url_hash long")
    new_seen, new_sk = seen.remove_from_seen(seen_tbl, sketches, doomed, n_shards=4)
    assert new_seen.count() == 40
    # exact path and sketch-accelerated path agree after the delete
    cand = spark.createDataFrame([(i,) for i in range(80)], "url_hash long")
    exact = sorted(r["url_hash"] for r in seen.filter_unseen(cand, new_seen).collect())
    fast = sorted(
        r["url_hash"]
        for r in seen.filter_unseen(cand, new_seen, new_sk, n_shards=4).collect()
    )
    assert exact == fast
    # deleted keys are findable again (no stale positives blocking readmission
    # beyond bloom's false-positive rate; cuckoo must be exact here)
    if kind == "cuckoo":
        deleted = [i for i in range(0, 60, 3)]
        got = {r["url_hash"] for r in
               seen.filter_unseen(spark.createDataFrame([(i,) for i in deleted],
                                                        "url_hash long"),
                                  new_seen, new_sk, n_shards=4).collect()}
        assert got == set(deleted)


def test_blacklist_cascade_removes_everywhere(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cascade"))
    s = CrawlScheduler(spark, root, use_sketch=False, lineage_hashes=False, **PARAMS)
    s.init()
    s.run_batch()
    s.run_batch()
    corpus = s.store.read("corpus")
    victims = [
        r["url_hash"]
        for r in s.store.read("pages").select("url_hash").limit(3).collect()
    ]
    assert victims
    before_pages = s.store.read("pages").count()
    out = s.apply_blacklist(victims)
    assert out["blacklisted"] == len(victims)
    st = s.store
    for table in ("frontier", "pages", "metrics_daily"):
        n = st.read(table).filter(F.col("url_hash").isin(victims)).count()
        assert n == 0, f"{table} still holds blacklisted rows"
    assert st.read("pages").count() == before_pages - len(victims)
    # corpus rows for those canonical URLs are gone
    remaining = (
        st.read("corpus")
        .withColumn("__h", F.conv(F.substring(F.md5("image_id"), 1, 15), 16, 10).cast("long"))
        .filter(F.col("__h").isin(victims))
        .count()
    )
    assert remaining == 0
    # seen verdict flipped; deny-list updated
    verdicts = {
        r["url_hash"]: r["verdict"]
        for r in st.read("seen").filter(F.col("url_hash").isin(victims)).collect()
    }
    assert all(v == "rejected" for v in verdicts.values()) and len(verdicts) == len(victims)
    assert st.read("blacklist").filter(F.col("url_hash").isin(victims)).count() == len(victims)
    # the crawl continues and never re-admits them
    s.run_batch()
    assert st.read("frontier").filter(F.col("url_hash").isin(victims)).count() == 0