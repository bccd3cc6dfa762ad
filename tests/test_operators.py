"""Operator-level tests: frontier pop, seen-set (exact + sketch),
politeness, robots, fetch, normalize — small inputs, exact expectations."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from crawler_spark import kernels, synth
from crawler_spark.operators import fetch as fetch_op
from crawler_spark.operators import frontier as frontier_op
from crawler_spark.operators import normalize, politeness, robots, seen
from crawler_spark.schemas import BLACKLIST, FRONTIER, POLITENESS, ROBOTS, SEEN

AS_OF = datetime(2023, 11, 14, 22, 13, 20)  # epoch 1_700_000_000
EPOCH = 1_700_000_000


def _frontier(spark, rows):
    return spark.createDataFrame(rows, FRONTIER)


def _row(i, host, prio, next_epoch, url=None):
    return (
        url or f"https://{host}/page/{i}",
        i,
        host,
        kernels.url_hash64(host) - (1 << 64) if kernels.url_hash64(host) >= (1 << 63) else kernels.url_hash64(host),
        prio,
        datetime.utcfromtimestamp(next_epoch),
        None,
        "seed",
        False,
        0,
    )


def test_pop_order_and_k_cap(spark):
    rows = [_row(i, "a.com", 1, EPOCH - 100 + i) for i in range(5)]
    rows += [_row(10 + i, "b.com", 0, EPOCH - 50) for i in range(3)]
    rows += [_row(20, "c.com", 0, EPOCH + 999)]  # not ready
    fr = _frontier(spark, rows)
    popped = frontier_op.pop(fr, AS_OF, k_per_host=2)
    got = {r["url_hash"] for r in popped.collect()}
    # a.com: 2 earliest next_fetch; b.com: tie on ts -> url_hash asc
    assert got == {0, 1, 10, 11}


def test_pop_budget_cap(spark):
    rows = [_row(i, "a.com", 1, EPOCH - 100) for i in range(5)]
    fr = _frontier(spark, rows)
    hh = fr.select("host_hash").first()["host_hash"]
    budget = spark.createDataFrame([(hh, 3)], "host_hash long, budget int")
    popped = frontier_op.pop(fr, AS_OF, k_per_host=10, host_budget=budget)
    assert popped.count() == 3
    # zero budget -> nothing pops
    budget0 = spark.createDataFrame([(hh, 0)], "host_hash long, budget int")
    assert frontier_op.pop(fr, AS_OF, 10, budget0).count() == 0


def test_pop_global_k_total_order(spark):
    rows = [_row(i, "a.com", 1, EPOCH - 100) for i in range(3)]
    rows += [_row(10 + i, "b.com", 0, EPOCH - 100) for i in range(3)]
    fr = _frontier(spark, rows)
    popped = frontier_op.pop(fr, AS_OF, k_per_host=3, global_k=4)
    got = sorted(r["url_hash"] for r in popped.collect())
    # priority 0 (b.com) first, then lowest url_hash of a.com
    assert got == [0, 10, 11, 12]


def test_after_fetch_updates_visibility(spark):
    fr = _frontier(spark, [_row(1, "a.com", 0, EPOCH - 10), _row(2, "a.com", 0, EPOCH - 10)])
    outcome = spark.createDataFrame(
        [(1, True, 3600)], "url_hash long, ok boolean, refresh_secs long"
    )
    out = frontier_op.after_fetch(fr, outcome, AS_OF)
    rows = {r["url_hash"]: r for r in out.collect()}
    assert rows[1]["priority"] == frontier_op.PRIORITY_UPDATE
    assert rows[1]["source"] == "update"
    assert rows[1]["next_fetch_ts"] > AS_OF
    assert rows[1]["last_fetch_ts"] == AS_OF
    assert rows[2]["priority"] == 0 and rows[2]["last_fetch_ts"] is None
    # the next pop must NOT re-select the fetched row
    popped = frontier_op.pop(out, AS_OF, 10)
    assert {r["url_hash"] for r in popped.collect()} == {2}


def test_seen_exact_and_sketch_equivalence(spark):
    cand = spark.createDataFrame([(i,) for i in range(50)], "url_hash long")
    seen_tbl = spark.createDataFrame(
        [(i, int(i % 16), "accepted", None) for i in range(0, 50, 2)], SEEN
    )
    exact = seen.filter_unseen(cand, seen_tbl)
    sketches = seen.build_sketches(seen_tbl)
    fast = seen.filter_unseen(cand, seen_tbl, sketches)
    a = sorted(r["url_hash"] for r in exact.collect())
    b = sorted(r["url_hash"] for r in fast.collect())
    assert a == b == list(range(1, 50, 2))
    # the partitioned (cogroup) probe — the unbroadcastable-sketch scale
    # path — must agree exactly, including the column set
    part = seen.filter_unseen(cand, seen_tbl, sketches, probe="partitioned")
    assert sorted(r["url_hash"] for r in part.collect()) == a
    assert part.columns == cand.columns


def test_sketch_merge_table(spark):
    s1 = spark.createDataFrame([(i, int(i % 4), "accepted", None) for i in range(20)], SEEN)
    s2 = spark.createDataFrame([(i, int(i % 4), "accepted", None) for i in range(20, 40)], SEEN)
    merged = seen.merge_sketch_tables(
        seen.build_sketches(s1, 4), seen.build_sketches(s2, 4), snapshot_id=9
    )
    rows = merged.collect()
    assert len(rows) == 4 and all(r["snapshot_id"] == 9 for r in rows)
    both = seen.build_sketches(s1.unionByName(s2), 4)
    bits_m = {r["shard_id"]: bytes(r["bits"]) for r in rows}
    bits_b = {r["shard_id"]: bytes(r["bits"]) for r in both.collect()}
    assert bits_m == bits_b  # associative merge == build-at-once


def test_politeness_budget_and_charge(spark):
    pol = spark.createDataFrame(
        [(1, 8, 10, 20231114, 100), (2, 10, 10, 20231114, 100), (3, 9, 10, 20230101, 100)],
        POLITENESS,
    )
    b = {r["host_hash"]: r["budget"] for r in politeness.remaining_budget(pol, AS_OF).collect()}
    assert b == {1: 2, 2: 0, 3: 10}  # host 3's day rolled -> full quota
    counts = spark.createDataFrame([(1, 2), (3, 4)], "host_hash long, n long")
    out = {r["host_hash"]: (r["used_quota"], r["quota_day"])
           for r in politeness.charge(pol, counts, AS_OF).collect()}
    assert out[1] == (10, 20231114)      # incremented, same day
    assert out[3] == (4, 20231114)       # reset on roll
    assert out[2] == (10, 20231114)      # untouched host unchanged


def test_politeness_rate_cap(spark):
    # min_delay 500ms, tick 2s -> at most 4 fetches per window even with
    # quota left; host 2 has delay 100ms -> quota (5) binds instead
    pol = spark.createDataFrame(
        [(1, 0, 100, 20231114, 500), (2, 5, 10, 20231114, 100)], POLITENESS
    )
    b = {r["host_hash"]: r["budget"]
         for r in politeness.remaining_budget(pol, AS_OF, tick_secs=2).collect()}
    assert b == {1: 4, 2: 5}


def test_robots_longest_prefix(spark):
    host_hash = 77
    rob = spark.createDataFrame(
        [(host_hash, [(True, "/"), (False, "/page/1")], None, None, [])], ROBOTS
    )
    cand = spark.createDataFrame(
        [("https://x.com/page/10", 1, host_hash), ("https://x.com/page/20", 2, host_hash),
         ("https://x.com/other", 3, host_hash), ("https://y.com/page/1", 4, 999)],
        "url string, url_hash long, host_hash long",
    )
    got = {r["url_hash"] for r in robots.filter_allowed(cand, rob).collect()}
    # /page/10 hits the /page/1 disallow prefix; unknown host defaults allow
    assert got == {2, 3, 4}


def test_fetch_deterministic_and_errors(spark):
    urls = [synth.url_of_index(i) for i in range(40)]
    rows = [_row(kernels.url_hash64(u), kernels.host_of(u), 0, EPOCH - 1, url=u) for u in urls]
    fr = _frontier(spark, rows)
    fetched = fetch_op.fetch(fr, universe=100)
    out = {r["url"]: r for r in fetched.collect()}
    assert len(out) == 40
    for u in urls:
        expect_fail = synth._rng("err:" + u).random() < 0.02
        r = out[u]
        assert (r["status"] == 503) == expect_fail
        if r["status"] == 200:
            page = synth.page_for_url(u, 100)
            assert r["caption"] == page["caption"]
            assert bytes(r["bytes"]) == page["bytes"]
            assert r["outlinks"] == page["outlinks"]


def test_decode_verify_psnr_invariant(spark):
    urls = [synth.url_of_index(i) for i in range(12)]
    data = []
    for u in urls:
        p = synth.page_for_url(u, 100)
        data.append((u, bytearray(p["bytes"])))
    df = spark.createDataFrame(data, "image_id string, bytes binary")
    out = normalize.decode_verify(df).collect()
    assert len(out) == 12
    for r in out:
        assert r["psnr_db"] >= 40.0  # input_hint invariant (inf for png)


def test_admission_verdict_precedence(spark):
    df = spark.createDataFrame(
        [(1, "sailing trip", "x", False),    # term hit -> admitted
         (2, "nothing here", "y", False),    # no term -> rejected
         (3, "nothing here", "y", True),     # ignore override -> admitted
         (4, "sailing trip", "x", True)],    # blacklisted -> rejected
        "url_hash long, title string, description string, ignore_filter_terms boolean",
    )
    bl = spark.createDataFrame([(4,)], BLACKLIST)
    out = {r["url_hash"]: r["admitted"]
           for r in normalize.admission_verdict(df, ["sailing"], bl).collect()}
    assert out == {1: True, 2: False, 3: True, 4: False}


def test_to_pages_normalization(spark):
    fr = _frontier(spark, [_row(kernels.url_hash64(synth.url_of_index(1)),
                                 "a.com", 0, EPOCH - 1, url=synth.url_of_index(1))])
    fetched = fetch_op.fetch(fr, universe=100)
    pages = normalize.to_pages(fetched, AS_OF).collect()
    assert len(pages) == 1
    p = pages[0]
    if p["error_msg"] is None:
        assert p["last_crawl_ts"] == AS_OF
        assert isinstance(p["keywords"], list) and "two word" in p["keywords"]
        assert p["views"] is not None


def test_keyword_tokenizer_sql_matches_kernel(spark):
    samples = ['a b "two word" c\\d', 'single', '"only quoted"', "x  y"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    out = df.select(
        F.transform(
            F.regexp_extract_all("s", F.lit('"[^"]+"|[^ ]+'), 0),
            lambda x: F.regexp_replace(x, '["\\\\]', ""),
        ).alias("toks")
    ).collect()
    for s, r in zip(samples, out):
        # kernel regex ["].+?["] == SQL "[^"]+" for non-nested quotes
        assert r["toks"] == [t for t in kernels.tokenize_keywords(s) if t != ""]


def test_apply_crawl_delay_takes_stricter_delay(spark):
    # host 1: ledger 500ms, robots Crawl-delay 2000ms -> 2000 binds
    # host 2: ledger 500ms, directive NULL -> ledger stands
    # host 3: ledger 500ms, no robots row at all -> ledger stands
    # host 4: ledger 500ms, directive 100ms (laxer) -> ledger stands
    pol = spark.createDataFrame(
        [(h, 0, 100, 20231114, 500) for h in (1, 2, 3, 4)], POLITENESS
    )
    robots_tbl = spark.createDataFrame(
        [(1, 2000), (2, None), (4, 100)],
        "host_hash long, crawl_delay_ms long",
    )
    eff = politeness.apply_crawl_delay(pol, robots_tbl)
    d = {r["host_hash"]: r["min_delay_ms"] for r in eff.collect()}
    assert d == {1: 2000, 2: 500, 3: 500, 4: 500}
    # and the budget rate cap follows the effective delay (tick 2s)
    b = {r["host_hash"]: r["budget"]
         for r in politeness.remaining_budget(eff, AS_OF, tick_secs=2).collect()}
    assert b == {1: 1, 2: 4, 3: 4, 4: 4}


def test_sitemap_urls_for_hosts(spark):
    from crawler_spark.operators import robots as robots_op

    popped = spark.createDataFrame(
        [(1,), (1,), (3,)], "host_hash long"
    )
    robots_tbl = spark.createDataFrame(
        [(1, ["https://a/sitemap/0", "https://a/sitemap/7"]),
         (2, ["https://b/sitemap/9"]),
         (3, [])],
        "host_hash long, sitemap_urls array<string>",
    )
    got = sorted(
        (r["raw_url"], r["depth"])
        for r in robots_op.sitemap_urls_for_hosts(popped, robots_tbl).collect()
    )
    # only POPPED hosts' sitemaps surface, at depth 1; empty lists explode
    # to nothing; host 2 (not popped) contributes nothing
    assert got == [("https://a/sitemap/0", 1), ("https://a/sitemap/7", 1)]
