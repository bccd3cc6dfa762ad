"""Order-controlled same-JVM crawl-throughput accounting (round-4 judge
next #3): decompose the driver-harness crawl trend into (host shift,
storage-path change, per-sidecar cost) with numbers instead of
narrative.

Design:
  * ONE Spark session; configs interleaved A,B,C,A,B,C (two passes) so
    slow host drift hits every config equally — cross-config deltas are
    order-controlled.
  * a fixed CALIBRATION job (pure shuffle+agg over spark.range, no
    engine code) runs before every config pass; its wall time is the
    host-speed yardstick that separates "the host got slower" from "the
    engine got slower" across rounds.
  * configs:
      r3_equiv      — the round-3 storage path: CoW merges everywhere
                      (seen_append=False, frontier_append=False), no
                      sidecars in the loop.
      r5_default    — today's default loop: invlist seen appends +
                      frontier hybrid commit, no sidecars.
      sidecars_live — r5_default plus every sidecar on the maintenance
                      cadence (corpus dedup + vindex + host graph +
                      rank boost + robots TTL), the 16-tick soak config
                      at bench scale.
  * per-config metric: fetched URLs/s over N_BATCHES (the bench_hook
    batch shape), medians across passes reported.

Output: one JSON line (bench-style) — paste the numbers into BENCH.md's
accounting section. Run on a QUIET host (no concurrent pytest).
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

CAL_ROWS = 20_000_000
N_BATCHES = 4
PASSES = 2

BASE = dict(
    universe=50_000, n_seeds=256, k_per_host=256, quota_boost=100,
    use_sketch=True, lineage_hashes=False,
)

CONFIGS = {
    "r3_equiv": dict(BASE, seen_append=False, frontier_append=False),
    "r5_default": dict(BASE),
    "sidecars_live": dict(
        BASE,
        maintenance_every=2,
        maintain_vindex=True,
        maintain_host_graph=True,
        rank_pop_boost=True,
        robots_ttl_secs=6 * 3600,
        robots_change_period_secs=6 * 3600,
    ),
}


def calibrate(spark) -> float:
    """Fixed host-speed yardstick: one shuffle+agg over a deterministic
    range — no engine code, no parquet, so its wall time moves only
    with host speed."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(CAL_ROWS, numPartitions=64)
        .select((F.col("id") % 9973).alias("k"), F.col("id").alias("v"))
        .groupBy("k").agg(F.sum("v").alias("s"))
        .agg(F.sum("s")).collect()
    )
    return round(time.perf_counter() - t0, 3)


def run_config(spark, params: dict) -> dict:
    from crawler_spark.streaming.scheduler import CrawlScheduler

    root = tempfile.mkdtemp(prefix="crawl_ab_")
    try:
        s = CrawlScheduler(spark, root, **params)
        s.init()
        t0 = time.perf_counter()
        stats = [s.run_batch() for _ in range(N_BATCHES)]
        secs = time.perf_counter() - t0
        ok = sum(x["fetched_ok"] for x in stats)
        return {
            "secs": round(secs, 3),
            "fetched_ok": ok,
            "urls_per_sec": round(ok / secs, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from crawler_spark.session import get_spark

    spark = get_spark("crawler_spark_bench_sidecars")
    out: dict = {"passes": []}
    for p in range(PASSES):
        row: dict = {"calibration_secs": {}}
        for name, params in CONFIGS.items():
            row["calibration_secs"][name] = calibrate(spark)
            row[name] = run_config(spark, params)
        out["passes"].append(row)
    med: dict = {}
    for name in CONFIGS:
        rates = sorted(p[name]["urls_per_sec"] for p in out["passes"])
        med[name] = rates[len(rates) // 2] if len(rates) % 2 else round(
            (rates[len(rates) // 2 - 1] + rates[len(rates) // 2]) / 2, 2
        )
    cal = sorted(
        c for p in out["passes"] for c in p["calibration_secs"].values()
    )
    out["median_urls_per_sec"] = med
    out["calibration_median_secs"] = cal[len(cal) // 2]
    out["n_batches"] = N_BATCHES
    print(json.dumps(out))


if __name__ == "__main__":
    main()
