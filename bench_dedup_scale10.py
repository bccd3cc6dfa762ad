"""De-risk the spill-safe posting-build surcharge (round-4 judge next
#9): BENCH.md's phase analysis claims the round-4 jaccard/minhash cost
increase (~25-35% at sf0.1) is a FIXED per-job floor (extra stage
boundaries of the dedup-agg + windowed-count build), not a per-row
cost — so at 10x the documents the surcharge fraction must shrink
toward zero.

Method: run the two pair builders on the real sf0.1 documents (1x) and
on a synthesized 10x corpus (each doc replicated with a distinct doc_id
and a per-replica suffix token so shingles mostly differ — same text
statistics, 10x the rows). Report secs, rows, and secs-per-1k-docs at
both scales: if the surcharge were per-row, the per-1k rate would hold;
a fixed floor shows up as the 10x per-1k rate dropping well below the
1x rate. Interleaved A/B ordering, two passes, medians.

Output: one JSON line for BENCH.md's hotspot section. Quiet host.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

REPLICAS = 10
PASSES = 2


def build_10x(spark, sf_dir: str) -> str:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    out_dir = tempfile.mkdtemp(prefix="docs10x_")
    reps = (
        docs.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("__r"))
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("__r") * F.lit(10_000_000))
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" replica"), F.col("__r").cast("string")),
        )
        .drop("__r")
    )
    reps.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    return out_dir


def timed(fn, spark, sf_dir) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()
    return round(time.perf_counter() - t0, 3), n


def main() -> None:
    from crawler_spark.queries import cleanup_caches
    from crawler_spark.queries_ml import q_dedup_jaccard_pairs, q_dedup_minhash_lsh
    from crawler_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("crawler_spark_bench_dedup10x")
    big_dir = build_10x(spark, sf_dir)
    from pyspark.sql import functions as F  # noqa: F401

    n1 = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    n10 = spark.read.parquet(os.path.join(big_dir, "documents.parquet")).count()
    builders = {"jaccard": q_dedup_jaccard_pairs, "minhash": q_dedup_minhash_lsh}
    runs: dict = {k: {"x1": [], "x10": []} for k in builders}
    try:
        for _ in range(PASSES):
            for name, fn in builders.items():
                s1, _ = timed(fn, spark, sf_dir)
                cleanup_caches()
                s10, _ = timed(fn, spark, big_dir)
                cleanup_caches()
                runs[name]["x1"].append(s1)
                runs[name]["x10"].append(s10)
        out: dict = {"docs_x1": n1, "docs_x10": n10, "passes": runs}
        for name in builders:
            # min across passes: the first pass carries JVM/codegen
            # cold-start that is NOT the posting-build floor under test
            m1 = min(runs[name]["x1"])
            m10 = min(runs[name]["x10"])
            out[f"{name}_secs_x1"] = m1
            out[f"{name}_secs_x10"] = m10
            out[f"{name}_per_1k_x1"] = round(1000 * m1 / n1, 4)
            out[f"{name}_per_1k_x10"] = round(1000 * m10 / n10, 4)
            # implied fixed floor under t = floor + rate*rows
            rate = (m10 - m1) / (n10 - n1)
            floor = max(0.0, m1 - rate * n1)
            out[f"{name}_implied_floor_secs"] = round(floor, 3)
            out[f"{name}_floor_share_x1"] = round(floor / m1, 3) if m1 else None
            out[f"{name}_floor_share_x10"] = round(floor / m10, 3) if m10 else None
        print(json.dumps(out))
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
