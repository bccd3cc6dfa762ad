"""Source-format coverage: the engine's tables round-trip through CSV,
JSON and partitioned parquet with explicit schemas, and filters still
reach the scan where the format supports it."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_SMALL}/events.parquet")


def _normalize(df):
    return {
        tuple(r)
        for r in df.select("event_id", "user_id", "event_type").collect()
    }


def test_csv_roundtrip_with_schema(spark, events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("csv"))
    events.write.mode("overwrite").option("header", True).csv(d)
    back = (
        spark.read.schema(events.schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(d)
    )
    assert _normalize(back) == _normalize(events)


def test_json_roundtrip_with_schema(spark, events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("json"))
    events.write.mode("overwrite").json(d)
    back = spark.read.schema(events.schema).json(d)
    assert _normalize(back) == _normalize(events)


def test_json_lines_parse_expression(spark, events):
    """from_json over a text column — the S9/S10 'API response parse'
    shape without any UDF."""
    js = events.select(F.to_json(F.struct("event_id", "event_type")).alias("line"))
    parsed = js.select(
        F.from_json("line", "event_id BIGINT, event_type STRING").alias("o")
    ).select("o.event_id", "o.event_type")
    assert _normalize(parsed.withColumn("user_id", F.lit(0)).select(
        "event_id", F.col("user_id"), "event_type")) == {
        (r["event_id"], 0, r["event_type"]) for r in events.collect()
    }


def test_partitioned_parquet_prunes(spark, events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("part"))
    events.withColumn("day", F.date_format("ts", "yyyyMMdd").cast("int")) \
        .write.mode("overwrite").partitionBy("day").parquet(d)
    one_day = spark.read.parquet(d).filter(F.col("day") == 20240105)
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition pruning: only the matching day's files are scanned
    assert "PartitionFilters: [isnotnull(day" in plan or "day#" in plan
    n_days = events.select(F.date_format("ts", "yyyyMMdd")).distinct().count()
    assert one_day.count() < events.count() / max(n_days - 5, 1) * 3