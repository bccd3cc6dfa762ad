#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver's instruction
the SAME job runs at two parallelism levels — local[N] vs local[4N] on
identical input — and we report throughput at both plus
efficiency = speedup / 4.

Jobs (the two throughput axes of the BASELINE.json metric):
  * fetch_decode — the fetch hot path: K URLs -> round-robin fan-out ->
    vectorized fetch UDF -> image decode + phash in the same narrow
    stage (payload bytes never shuffled); embarrassingly parallel.
  * frontier_pop — M-row synthetic frontier -> ready filter -> per-host
    window rank -> politeness cap; shuffle-bound.
  * minhash_dedup — D synthetic documents -> 3-word shingles -> 8-lane
    array-land minhash signature -> lsh_band_pairs (the engine's
    spill-safe windowed posting build + hot-bucket cap — the
    training-data dedup axis); expression-heavy with one band-key
    shuffle.

Isolation: every (job, cores) pair runs in its OWN subprocess/JVM
(shuffle files, GC state and page cache of one job can't leak into the
other's timing), timed best-of-REPEATS after a warmup. Both core levels
of one job run BACK-TO-BACK within a pass and efficiency is computed
per pass — slowly-drifting co-tenant load cancels in the ratio — with
the median-efficiency pass of PASSES reported. Shuffle partition COUNT
is pinned (64) at both levels, like a real cluster job: fixed
partitioning, varying executor count.

Choice of N=2 vs 4N=8 (driver text: "e.g. local[8] and local[32], or N
and 4N cores"): this sandbox is a shared host with 32 logical CPUs,
~16 physical cores (SMT), and a measured memory-bandwidth ceiling. A
pure-Python CPU probe scales 4.01x from 4->16 workers but only 2.84x
from 8->32 (hyperthreads); the actual fetch kernel (numpy/image work)
additionally saturates allocation bandwidth above ~8 concurrent
workers: multiprocessing probe of page-gen+decode+phash scales 3.56x
from 2->8 workers (total CPU flat) but only 2.37x from 4->16 (total
CPU +27% — contention, not compute). 2-vs-8 is therefore the widest
pair where the HOST can express 4x, i.e. where the measurement reflects
the engine rather than the sandbox's memory subsystem.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

K_URLS = 72_000
# 24M rows: at 8 cores the window job runs ~10 s, so fixed per-job costs
# (stage scheduling for 64 tasks x 3 stages, noop commit barrier) are <5%
# of the measurement — at 8M they were ~10% and read as fake inefficiency
M_FRONTIER = 24_000_000
D_DOCS = int(os.environ.get("BENCH_D_DOCS", 64_000))  # ~50-word docs
CORES = (2, 8)
REPEATS = 3   # best-of within one JVM
PASSES = 3    # full passes; per-cell median across passes (shared host)


def _session(cores: int):
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    from crawler_spark.session import get_spark

    spark = get_spark(f"bench_scaling_{cores}", master=f"local[{cores}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _job_fetch(cores: int) -> dict:
    from pyspark.sql import functions as F

    from crawler_spark.operators import fetch as fetch_op
    from crawler_spark.operators import normalize

    spark = _session(cores)
    urls = spark.range(K_URLS).select(
        F.format_string("https://host%03d.example.com/page/%d",
                        F.pmod("id", F.lit(64)), F.col("id")).alias("url")
    ).select(
        "url",
        F.conv(F.substring(F.md5("url"), 1, 15), 16, 10).cast("long").alias("url_hash"),
        F.regexp_extract("url", "https://([^/]+)/", 1).alias("host"),
        F.xxhash64(F.regexp_extract("url", "https://([^/]+)/", 1)).alias("host_hash"),
        F.lit(0).alias("depth"),
    )
    _noop(fetch_op.fetch(urls.limit(2048), universe=K_URLS))  # warmup all workers
    best = None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _noop(normalize.to_corpus(fetch_op.fetch(urls, universe=K_URLS)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {"cores": cores, "secs": round(best, 3),
            "per_sec": round(K_URLS / best, 1)}


def _job_pop(cores: int) -> dict:
    from datetime import datetime

    from pyspark.sql import functions as F

    from crawler_spark.operators import frontier as frontier_op

    spark = _session(cores)
    # FIXED input split count at both levels (like HDFS/parquet splits on
    # a real cluster): spark.range defaults to one partition per core,
    # which changes how much the map-side WindowGroupLimit can prune per
    # task (fewer, larger tasks prune MORE rows before the shuffle) — a
    # data-layout artifact, not an execution-scaling effect
    fr = spark.range(0, M_FRONTIER, 1, 64).select(
        F.format_string("u%d", "id").alias("url"),
        F.xxhash64("id").alias("url_hash"),
        F.lit("h").alias("host"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("host_hash"),
        F.pmod("id", F.lit(3)).cast("int").alias("priority"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) - F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000_000))
        ).alias("next_fetch_ts"),
        F.lit(None).cast("timestamp").alias("last_fetch_ts"),
        F.lit("seed").alias("source"),
        F.lit(False).alias("ignore_filter_terms"),
        F.lit(0).alias("depth"),
    )
    as_of = datetime(2023, 11, 14, 22, 13, 20)
    _noop(frontier_op.pop(fr, as_of, k_per_host=100))  # warmup
    best = None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _noop(frontier_op.pop(fr, as_of, k_per_host=100))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {"cores": cores, "secs": round(best, 3),
            "per_sec": round(M_FRONTIER / best, 1)}


def _minhash_frames(spark):
    """Shared fixture for the minhash jobs: synthetic docs -> 8-lane
    array-land signatures (sig), plus a pairs() callable running the
    ENGINE's lsh_band_pairs plan over the given signature frame."""
    from pyspark.sql import functions as F

    from crawler_spark.queries_ml import (
        _LSH_BANDS, _LSH_BUCKET_CAP, _MASK60, _MINHASH_LANES,
        _shingles, lsh_band_pairs,
    )
    # synthetic ~50-word docs from a 500-token vocab, generated JVM-side
    # (generation scales with the same parallelism as the measured work,
    # like the fetch job's synthetic pages); fixed input splits as above
    docs = spark.range(0, D_DOCS, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(50)),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 64 + i), F.lit(500))
                ),
            ),
            " ",
        ).alias("text"),
    )
    hexes = F.transform(_shingles(F.col("text")), F.md5)
    hs = F.transform(
        hexes,
        lambda x: F.struct(
            F.conv(F.substring(x, 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(x, 16, 15), 16, 10).cast("long").alias("h2"),
        ),
    )
    d = docs.select("doc_id", hs.alias("hs"))
    sig = d.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(
                    "hs", lambda p: (p.h1 + F.lit(i) * p.h2).bitwiseAND(F.lit(_MASK60))
                )
            ).alias(f"h{i}")
            for i in range(_MINHASH_LANES)
        ],
    )

    def pairs():
        bands = None
        for b in range(_LSH_BANDS):
            one = sig.select(
                "doc_id", F.lit(b).alias("band"),
                F.col(f"h{2 * b}").alias("k1"), F.col(f"h{2 * b + 1}").alias("k2"),
            )
            bands = one if bands is None else bands.unionByName(one)
        # the ENGINE's pair path (queries_ml.lsh_band_pairs): spill-safe
        # windowed posting build with the hot-bucket cap — the same plan
        # the registry query and the crawl loop's full dedup run
        _noop(lsh_band_pairs(bands, _LSH_BUCKET_CAP))

    return sig, pairs


def _job_minhash(cores: int) -> dict:
    spark = _session(cores)
    sig, pairs = _minhash_frames(spark)

    def run():
        # like the registry query: signatures are materialized ONCE
        # (persist), then the 4 band views read the cache — without it
        # the whole md5/conv tree re-evaluates per band
        sig.unpersist(blocking=True)
        sig.persist()
        _noop(sig)  # timed: the signature computation itself
        pairs()

    run()  # warmup
    best = None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {"cores": cores, "secs": round(best, 3),
            "per_sec": round(D_DOCS / best, 1)}


def _job_minhash_phases(cores: int) -> dict:
    """Root-cause probe (not part of the default harness run): time the
    minhash job's two phases SEPARATELY — `sig` = the md5/conv signature
    build (string/allocation heavy; candidate for the host's
    memory-bandwidth ceiling) and `pairs` = the engine's lsh_band_pairs
    posting plan over CACHED signatures (the code that actually ships).
    Run at both core levels:

        taskset -c 0-1 python bench_scaling.py --job minhash_phases --cores 2
        taskset -c 0-7 python bench_scaling.py --job minhash_phases --cores 8

    per-phase efficiency = (secs_N / secs_4N) / (4N/N)."""
    spark = _session(cores)
    sig, pairs = _minhash_frames(spark)

    def run_sig():
        sig.unpersist(blocking=True)
        sig.persist()
        _noop(sig)

    run_sig()
    pairs()  # warmup both
    best = {"sig": None, "pairs": None}
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run_sig()
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        pairs()  # reads the warm cache: isolates the pair plan
        tp = time.perf_counter() - t0
        best["sig"] = ts if best["sig"] is None else min(best["sig"], ts)
        best["pairs"] = tp if best["pairs"] is None else min(best["pairs"], tp)
    return {
        "cores": cores,
        "sig_secs": round(best["sig"], 3),
        "pairs_secs": round(best["pairs"], 3),
    }


JOBS = {"fetch": _job_fetch, "pop": _job_pop, "minhash": _job_minhash}
PROBE_JOBS = {"minhash_phases": _job_minhash_phases}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--job", choices=list(JOBS) + list(PROBE_JOBS), default=None
    )
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args()
    if args.job:
        fn = JOBS.get(args.job) or PROBE_JOBS[args.job]
        print("RESULT " + json.dumps(fn(args.cores)), flush=True)
        return

    here = os.path.dirname(os.path.abspath(__file__))

    def _run_cell(job: str, cores: int) -> dict:
        # taskset pins the WHOLE JVM (GC, shuffle-IO, netty threads and
        # python workers) to exactly `cores` CPUs — without it local[N]'s
        # background threads borrow idle cores and inflate the low-N
        # baseline, understating scaling by ~20%
        out = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}",
             sys.executable, os.path.abspath(__file__),
             "--job", job, "--cores", str(cores)],
            capture_output=True, text=True, check=True, cwd=here,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")][-1]
        return json.loads(line[len("RESULT "):])

    # the sandbox is a SHARED host: one pass is a measurement lottery.
    # Co-tenant load drifts on a minutes scale, so the two core levels of
    # one job are run BACK-TO-BACK within a pass and the efficiency is
    # computed PER PASS (ratio of temporally-adjacent cells — slow drift
    # cancels in the ratio), then the MEDIAN-efficiency pass is reported
    # per job. Median-of-ratios is robust where ratio-of-medians can pair
    # a loaded 2-core sample with an unloaded 8-core one and fake a
    # regression (or a superlinear speedup).
    n, n4 = CORES
    ratio = n4 / n
    passes: dict[str, list[dict[int, dict]]] = {j: [] for j in JOBS}
    jobs_order = list(JOBS)
    for p in range(PASSES):
        order = jobs_order if p % 2 == 0 else list(reversed(jobs_order))
        for job in order:
            passes[job].append({c: _run_cell(job, c) for c in CORES})

    def _pass_eff(pair: dict[int, dict]) -> float:
        return (pair[n]["secs"] / pair[n4]["secs"]) / ratio

    results = {}
    eff = {}
    eff_passes = {}
    for j in JOBS:
        by_eff = sorted(passes[j], key=_pass_eff)
        rep = by_eff[len(by_eff) // 2]  # median-efficiency pass
        results[j] = rep
        eff[j] = round(_pass_eff(rep), 3)
        eff_passes[j] = [round(_pass_eff(p), 3) for p in passes[j]]
    summary = {
        "metric": "scaling_efficiency_Nto4N",
        "cores": list(CORES),
        "fetch_urls_per_sec": {str(c): results["fetch"][c]["per_sec"] for c in CORES},
        "pop_rows_per_sec": {str(c): results["pop"][c]["per_sec"] for c in CORES},
        "minhash_docs_per_sec": {str(c): results["minhash"][c]["per_sec"] for c in CORES},
        "efficiency_fetch": eff["fetch"],
        "efficiency_pop": eff["pop"],
        "efficiency_minhash": eff["minhash"],
        "efficiency_passes": eff_passes,
        "detail": results,
    }
    print(json.dumps(summary))

    # preserve hand-maintained sections (round-over-round baseline table)
    # below the generated scaling block
    bench_md = os.path.join(here, "BENCH.md")
    preserved = ""
    if os.path.exists(bench_md):
        with open(bench_md) as f:
            old = f.read()
        # keep everything from the first hand-maintained section on
        # (cross-run variance table, round-over-round baseline)
        for marker in ("\n### Cross-run variance", "\n## Round-over-round baseline"):
            if marker in old:
                preserved = marker + old.split(marker, 1)[1]
                break
    with open(bench_md, "w") as f:
        f.write(
            "# BENCH — scaling evidence (N vs 4N parallelism)\n\n"
            "Same job, same input, two parallelism levels (sandbox stand-in\n"
            "for N vs 4N executors per the driver instruction; north_rule\n"
            "asks for scaling efficiency >= 0.8). Each (job, level) runs in\n"
            "an isolated JVM pinned with `taskset` to exactly N CPUs (so GC /\n"
            "shuffle-IO / python workers can't borrow idle cores and inflate\n"
            "the low-N baseline), warmup + best-of-3 within a JVM; both core\n"
            "levels of a job run BACK-TO-BACK and efficiency is computed per\n"
            "pass (slow co-tenant drift cancels in the ratio), median-\n"
            "efficiency pass of 3 reported (shared-host noise defuse);\n"
            "shuffle partitions AND input splits pinned at 64 for both levels\n"
            "(fixed partitioning/splits, varying executor count — like a real\n"
            "cluster job).\n\n"
            f"N={n} vs 4N={n4} cores: the sandbox is a shared host (32 logical\n"
            "CPUs, ~16 physical, SMT) whose memory-allocation bandwidth\n"
            "saturates above ~8 concurrent numpy workers — a multiprocessing\n"
            "probe of the raw fetch kernel scales 3.56x from 2->8 workers\n"
            "(total CPU flat) but only 2.37x from 4->16 (total CPU +27%), and\n"
            "a pure-CPU probe scales 2.84x from 8->32 (hyperthreads). 2-vs-8\n"
            "is the widest pair where the HOST can express 4x, so the\n"
            "measurement reflects the engine, not the sandbox's memory bus.\n\n"
            f"Jobs: fetch+decode of {K_URLS:,} image URLs (vectorized UDF hot\n"
            f"path, payload bytes never shuffled); frontier pop over\n"
            f"{M_FRONTIER:,} rows (ready filter -> per-host window rank);\n"
            f"minhash+LSH dedup over {D_DOCS:,} synthetic ~50-word docs\n"
            "(array-land signatures -> the engine's lsh_band_pairs\n"
            "spill-safe windowed posting build — the training-data dedup\n"
            "axis).\n\n"
            f"| job | local[{n}] | local[{n4}] | speedup | efficiency (target >= 0.8) |\n"
            "|---|---|---|---|---|\n"
            f"| fetch+decode (URLs/s) | {results['fetch'][n]['per_sec']:,} | "
            f"{results['fetch'][n4]['per_sec']:,} | "
            f"{results['fetch'][n]['secs'] / results['fetch'][n4]['secs']:.2f}x | {eff['fetch']:.3f} |\n"
            f"| frontier pop (rows/s) | {results['pop'][n]['per_sec']:,} | "
            f"{results['pop'][n4]['per_sec']:,} | "
            f"{results['pop'][n]['secs'] / results['pop'][n4]['secs']:.2f}x | {eff['pop']:.3f} |\n"
            f"| minhash dedup (docs/s) | {results['minhash'][n]['per_sec']:,} | "
            f"{results['minhash'][n4]['per_sec']:,} | "
            f"{results['minhash'][n]['secs'] / results['minhash'][n4]['secs']:.2f}x | {eff['minhash']:.3f} |\n\n"
            f"Raw: `{json.dumps(results)}`\n"
        )
        f.write(preserved)


if __name__ == "__main__":
    main()
