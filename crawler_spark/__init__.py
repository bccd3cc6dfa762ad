"""crawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch re-expression of the crawl semantics of the reference
(``sailingchannels/crawler``, a Rust daemon: frontier -> politeness ->
fetch -> normalize -> dedup -> merge -> metrics) as batched, partitioned
Spark dataflow over snapshot-versioned Parquet tables (Iceberg-style),
plus the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal columns) such a pipeline needs at 100 TB.

Layout:
  session    — SparkSession factory (AQE, Arrow, shuffle sizing)
  kernels    — pure, vectorized (numpy/pandas) parity-critical functions
  schemas    — every table StructType (FIXTURES.md)
  synth      — deterministic seeded synthetic crawl-domain data
  tables     — SnapshotStore: atomic snapshot commits + MERGE INTO via
               join-rewrite (drop-in for a real Iceberg catalog)
  operators/ — frontier pop, admission, politeness, dedup, similarity,
               text analysis, metrics, merge
  sources/   — simulated batched fetch (Arrow UDFs), page parse/explode
  streaming/ — micro-batch scheduler + pure-Python reference simulator
  plans/     — explain helpers and plan assertions (pushdown checks)
"""

__version__ = "0.1.0"
