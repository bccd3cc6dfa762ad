#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north_rule launch shape:
``spark-submit --py-files crawler_spark.zip cli.py --root /path ...``).

Runs N micro-batches of the crawl loop against a snapshot store; resumes
from HEAD if the store already exists (kill/resume safe).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="crawler_spark micro-batch crawl loop")
    p.add_argument("--root", required=True, help="snapshot store directory")
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--universe", type=int, default=10_000)
    p.add_argument("--seeds", type=int, default=32)
    p.add_argument("--k-per-host", type=int, default=8)
    p.add_argument("--tick-secs", type=int, default=6 * 3600)
    p.add_argument("--no-sketch", action="store_true")
    p.add_argument("--no-lineage-hash", action="store_true")
    p.add_argument("--quota-boost", type=int, default=1)
    args = p.parse_args(argv)

    from crawler_spark.session import get_spark
    from crawler_spark.streaming.scheduler import CrawlScheduler

    spark = get_spark("crawler_spark_cli")
    spark.sparkContext.setLogLevel("ERROR")
    sched = CrawlScheduler(
        spark,
        args.root,
        universe=args.universe,
        n_seeds=args.seeds,
        k_per_host=args.k_per_host,
        tick_secs=args.tick_secs,
        use_sketch=not args.no_sketch,
        lineage_hashes=not args.no_lineage_hash,
        quota_boost=args.quota_boost,
    )
    sched.init()
    t0 = time.perf_counter()
    for _ in range(args.batches):
        stats = sched.run_batch()
        print(json.dumps(stats), flush=True)
    secs = time.perf_counter() - t0
    print(json.dumps({"total_secs": round(secs, 3),
                      "snapshot_id": sched.store.snapshot_id}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
