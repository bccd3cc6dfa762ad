#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

Extras (not required by the driver, used by BENCH notes): per-query rows,
and crawl-pipeline throughput when the scheduler is available.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per operator family, weighted toward shuffle-heavy ops
HEADLINE = [
    "pricing_rollup",        # scan + partial agg
    "frontier_pop_topk",     # TakeOrderedAndProject
    "window_topk_per_key",   # shuffle + window rank (per-host pop)
    "count_by_key",          # hash agg, 600k rows
    "lookup_left_join",      # broadcast hash join
    "seen_anti_join",        # anti join (URL-seen)
    "daily_snapshot_last",   # window dedup
    "merge_upsert",          # full-outer MERGE rewrite
    "dedup_minhash_lsh",     # explode + 8-lane agg + band self-join
    "dedup_jaccard_pairs",   # shingle self-join w/ stop-shingle cap
    "knn_cosine_topk",       # vector math, JVM-side
    "text_token_stats",      # regex-heavy scan
]


def run_query(spark, fn, sf_dir: str) -> tuple[float, int]:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    # noop sink: full computation, no result materialization on driver
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0, -1


def main() -> None:
    from crawler_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("crawler_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    # JVM/codegen warmup of every query path on the smallest SF so
    # timings measure the engine, not JIT compilation
    for name in HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in HEADLINE:
        spark.catalog.clearCache()  # drop persisted intermediates of prior query
        secs, _ = run_query(spark, qs[name], SF_DIR)
        times[name] = round(secs, 3)

    # hot-spot tracking (round-2 bench hygiene): the two dedup
    # heavyweights dominate the headline total, so measure them at a
    # SECOND scale factor too — a regression that scales with data
    # shows up as a ratio change between the two SFs, not just noise
    # in the big number
    hotspot: dict[str, float] = {}
    for name in ("dedup_minhash_lsh", "dedup_jaccard_pairs"):
        spark.catalog.clearCache()
        secs, _ = run_query(spark, qs[name], "/root/testdata/sf0.01")
        hotspot[name] = round(secs, 3)

    result = {
        "metric": "headline_query_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "hotspot_sf0.01": hotspot,
    }

    # crawl-pipeline throughput (fetched-URLs/s, pops/s) once the scheduler
    # lands; guarded so bench works at every stage of the build
    try:
        from crawler_spark.streaming.bench_hook import crawl_bench  # noqa: PLC0415
        result.update(crawl_bench(spark))
    except Exception:
        pass

    print(json.dumps(result))


if __name__ == "__main__":
    main()
