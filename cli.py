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
    p.add_argument("--universe", type=int, default=None,
                   help="(default 10000 unless set in config/env)")
    p.add_argument("--seeds", type=int, default=None)
    p.add_argument("--k-per-host", type=int, default=None)
    p.add_argument("--tick-secs", type=int, default=None)
    p.add_argument("--no-sketch", action="store_true")
    p.add_argument("--pq", action="store_true",
                   help="maintain the residual-PQ codes sidecar (trains the "
                        "frozen model on the first maintenance tick; implies "
                        "a maintenance cadence of every 4 batches if none is "
                        "configured — sidecar upkeep only runs on maintenance "
                        "ticks)")
    p.add_argument("--rebalance-pq", action="store_true",
                   help="after the batches: retrain the PQ model on the "
                        "grown corpus and CoW re-encode (offline drift "
                        "corrector for the frozen per-tick model; implies "
                        "--pq)")
    p.add_argument("--dsir", action="store_true",
                   help="maintain the DSIR data-selection sidecar (tokenize-"
                        "once feature table + folded count distributions; "
                        "same maintenance-cadence default as --pq)")
    p.add_argument("--streaming", action="store_true",
                   help="drive the batches through Structured Streaming "
                        "(foreachBatch tick source + concurrent live skew "
                        "feed) instead of the plain loop — semantics-free: "
                        "tables are bit-identical either way")
    p.add_argument("--no-lineage-hash", action="store_true")
    p.add_argument("--no-discovery", action="store_true")
    p.add_argument("--no-recrawl", action="store_true")
    p.add_argument("--quota-boost", type=int, default=None)
    p.add_argument("--config", default=None,
                   help="JSON config file (CRAWLER_SPARK_* env overrides apply on top)")
    args = p.parse_args(argv)

    from crawler_spark.config import CrawlConfig
    from crawler_spark.session import get_spark
    from crawler_spark.streaming.scheduler import CrawlScheduler

    cfg = CrawlConfig.load(args.config)
    # explicit CLI flags override config-file/env values; unset flags
    # (default None) leave the file/env layering intact
    if args.universe is not None:
        cfg.universe = args.universe
    if args.seeds is not None:
        cfg.n_seeds = args.seeds
    if args.k_per_host is not None:
        cfg.k_per_host = args.k_per_host
    if args.tick_secs is not None:
        cfg.tick_secs = args.tick_secs
    if args.quota_boost is not None:
        cfg.quota_boost = args.quota_boost
    if args.no_sketch:
        cfg.use_sketch = False
    if args.rebalance_pq:
        cfg.maintain_pq = True
        if not cfg.maintenance_every:
            cfg.maintenance_every = 4
    if args.pq:
        cfg.maintain_pq = True
        # sidecar upkeep only runs on maintenance ticks; --pq with no
        # cadence configured would be a silent no-op
        if not cfg.maintenance_every:
            cfg.maintenance_every = 4
    if args.dsir:
        cfg.maintain_dsir = True
        if not cfg.maintenance_every:
            cfg.maintenance_every = 4
    if args.no_lineage_hash:
        cfg.lineage_hashes = False
    if args.no_discovery:
        cfg.enable_discovery = False
    if args.no_recrawl:
        cfg.enable_recrawl = False

    spark = get_spark("crawler_spark_cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.streaming:
        from crawler_spark.streaming.demo import run_streaming_crawl

        t0 = time.perf_counter()
        out = run_streaming_crawl(
            spark, args.root, args.batches, **cfg.scheduler_kwargs()
        )
        for stats in out.pop("per_batch"):
            print(json.dumps(stats), flush=True)
        out["total_secs"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(out), flush=True)
        return
    sched = CrawlScheduler(spark, args.root, **cfg.scheduler_kwargs())
    sched.init()
    t0 = time.perf_counter()
    for _ in range(args.batches):
        stats = sched.run_batch()
        print(json.dumps(stats), flush=True)
    if args.rebalance_pq:
        print(json.dumps(sched.rebalance_pq()), flush=True)
    secs = time.perf_counter() - t0
    print(json.dumps({"total_secs": round(secs, 3),
                      "snapshot_id": sched.store.snapshot_id}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
