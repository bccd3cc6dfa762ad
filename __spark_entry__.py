"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (per-host frontier pop) on sf0.001.
queries()    — one entry per implemented operator from SURVEY.md §2 plus
               the training-data ops; registry in crawler_spark/queries*.py.
oracle_sql() — DuckDB-runnable ANSI SQL twin for every SQL-expressible
               query (same aliases, same rounding, same hash scheme).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crawler_spark.queries import REGISTRY
import crawler_spark.queries_eval  # noqa: F401  (populates REGISTRY)
import crawler_spark.queries_graph  # noqa: F401  (populates REGISTRY)
import crawler_spark.queries_index  # noqa: F401  (populates REGISTRY)
import crawler_spark.queries_ml  # noqa: F401  (populates REGISTRY)
import crawler_spark.queries_media  # noqa: F401  (populates REGISTRY)
import crawler_spark.queries_scale  # noqa: F401  (populates REGISTRY)
import crawler_spark.queries_temporal  # noqa: F401  (populates REGISTRY)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the per-host frontier pop (SURVEY §2.1 S4 / §2.5 W1) —
    rank URLs per host by priority with deterministic tiebreaks, take k.
    Runs on sf0.001; the driver checks rows > 0 and a stable schema."""
    fn, _ = REGISTRY["window_topk_per_key"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
