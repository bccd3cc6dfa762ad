"""Normalize / classify / decode — the reference's scrape step, set-wise.

Re-expresses src/scraper/channel_scraper.rs:46-138 (normalize fields,
classify against the term vocabulary, language-detect, snapshot metrics)
and the discovery admission of src/crawler/channel_discovery_crawler.rs:
66-97 as DataFrame stages. Python appears ONLY in vectorized pandas/Arrow
UDFs (language ID, URL canonicalization, image decode+phash) — every
other expression is JVM-side Catalyst (input_hint: no per-row Python).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crawler_spark import kernels, synth
from crawler_spark.schemas import CORPUS, METRICS_DAILY, PAGES

# ---------------------------------------------------------------------------
# classification (SURVEY §2.3 J4/J5, P7) — pure Catalyst
# ---------------------------------------------------------------------------

def has_term_col(title, description, terms: list[str]) -> F.Column:
    """Any vocabulary term substring-matches lower(title)||lower(desc)
    (ref sailing_terms_service.rs:47-54). One compiled rlike pass instead
    of a per-term loop; for huge vocabularies switch to the broadcast
    theta-join form (queries.q_term_theta_join)."""
    pat = "|".join(re.escape(t.lower()) for t in terms)
    text = F.concat_ws("\n", F.lower(title), F.lower(description))
    return text.rlike(pat)


def admission_verdict(
    df: DataFrame,
    terms: list[str],
    blacklist: DataFrame,
    title="title",
    description="description",
    ignore_col="ignore_filter_terms",
) -> DataFrame:
    """Adds `admitted:boolean` with the reference's precedence
    (sailing_terms_service.rs:37-77): blacklist > ignore-override > term
    match. Blacklist membership via broadcast left-semi shape (marker
    join), vocabulary via rlike."""
    marked = df.join(
        F.broadcast(blacklist.select("url_hash").withColumn("__bl", F.lit(True))),
        "url_hash",
        "left",
    )
    verdict = F.when(F.col("__bl").isNotNull(), F.lit(False)).otherwise(
        F.coalesce(F.col(ignore_col), F.lit(False))
        | has_term_col(F.col(title), F.col(description), terms)
    )
    return marked.withColumn("admitted", verdict).drop("__bl")


# ---------------------------------------------------------------------------
# vectorized UDFs (language, canonicalization, snippet, image decode)
# ---------------------------------------------------------------------------

@F.pandas_udf(StringType())
def language_udf(title: pd.Series, description: pd.Series) -> pd.Series:
    """F11: deterministic stopword-vote language ID with reliability gate
    (kernels.detect_language; replaces whatlang at channel_scraper.rs:
    170-199)."""
    return kernels.detect_language(title.fillna("") + "\n" + description.fillna(""))


@F.pandas_udf(StringType())
def canonical_url_udf(url: pd.Series) -> pd.Series:
    return kernels.canonicalize_urls(url)


@F.pandas_udf(LongType())
def url_hash_udf(url: pd.Series) -> pd.Series:
    return kernels.url_hashes64(url)


@F.pandas_udf(StringType())
def host_udf(url: pd.Series) -> pd.Series:
    return url.map(kernels.host_of)


_SNIPPET = StructType([
    StructField("url", StringType(), False),
    StructField("title", StringType()),
    StructField("description", StringType()),
])


def snippet_fetch(urls_df: DataFrame, universe: int = 10_000) -> DataFrame:
    """Cheap 'snippet' fetch for candidate classification — title+desc
    only, no image payload (ref: discovery classifies subscription
    snippets, channel_discovery_crawler.rs:66-74)."""

    def _snip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pages = [synth.page_for_url(u, universe, with_payload=False) for u in pdf["url"]]
            yield pd.DataFrame({
                "url": pdf["url"].to_numpy(),
                "title": [p["title"] for p in pages],
                "description": [p["description"] for p in pages],
            })

    # explicit fan-out: upstream is a groupBy whose shuffle AQE coalesces
    # by BYTES — tiny URL batches would serialize this CPU-bound stage
    n = urls_df.sparkSession.sparkContext.defaultParallelism
    return urls_df.select("url").repartition(n).mapInPandas(_snip, _SNIPPET)


_DECODE = StructType([
    StructField("image_id", StringType(), False),
    StructField("phash", LongType()),
    StructField("psnr_db", DoubleType()),
])


def decode_verify(corpus_like: DataFrame) -> DataFrame:
    """Arrow-batched image decode + phash + PSNR-vs-source (input_hint
    invariant: decoded-pixel allclose, PSNR>=40dB lossy). Input needs
    (image_id, bytes); image_id is the canonical URL so the deterministic
    source pixels are recomputable for the PSNR check."""

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, phashes, psnrs = [], [], []
            for image_id, payload in zip(pdf["image_id"], pdf["bytes"]):
                px = kernels.decode_image(bytes(payload))
                src = synth.content_pixels(image_id)
                ids.append(image_id)
                phashes.append(kernels.phash64(px))
                psnrs.append(
                    float(kernels.psnr(src, px)) if src.shape == px.shape else 0.0
                )
            yield pd.DataFrame({
                "image_id": ids,
                "phash": np.asarray(phashes, dtype="int64"),
                "psnr_db": np.asarray(psnrs, dtype="float64"),
            })

    return corpus_like.select("image_id", "bytes").mapInPandas(_dec, _DECODE)


# ---------------------------------------------------------------------------
# output shaping (pages / corpus / metrics / candidates)
# ---------------------------------------------------------------------------

def to_pages(fetched: DataFrame, as_of_ts, item_stats: DataFrame | None = None) -> DataFrame:
    """FETCH_RESULT -> `pages` rows (ref channel doc build,
    channel_scraper.rs:84-129): F1 lowercase country, F3 keyword
    tokenizer (pure SQL regexp), F4 casts, F5 epoch->timestamp, F11
    language UDF; errors land in error_at/error_msg (S15).

    `item_stats` (url_hash, item_count, last_item_ts) is the A1/A3
    write-back from the per-item sub-pipeline (ref video_scraper.rs:61-77
    -> channel_repo.rs:143-163: videoCount + lastUploadAt stamped on the
    channel doc); pages without stats get 0/NULL (no items)."""
    ok = F.col("status") == 200
    base = fetched.select(
        "url_hash",
        "title",
        "description",
        F.lower("country").alias("country"),
        F.transform(
            F.regexp_extract_all("keywords_raw", F.lit('"[^"]+"|[^ ]+'), 0),
            lambda x: F.regexp_replace(x, '["\\\\]', ""),
        ).alias("keywords"),
        language_udf("title", "description").alias("language"),
        F.to_timestamp(F.from_unixtime("published_epoch")).alias("published_ts"),
        F.col("views").cast("long").alias("views"),
        F.coalesce(F.col("subscribers"), F.lit(0)).cast("long").alias("subscribers"),
        "subscribers_hidden",
        F.lit(as_of_ts).cast("timestamp").alias("last_crawl_ts"),
        F.when(~ok, F.lit(as_of_ts).cast("timestamp")).alias("error_at_ts"),
        F.when(~ok, F.col("error")).alias("error_msg"),
    )
    if item_stats is None:
        base = base.withColumn("item_count", F.lit(0).cast("long")).withColumn(
            "last_item_ts", F.lit(None).cast("timestamp")
        )
    else:
        stats = item_stats.select(
            "url_hash",
            F.col("item_count").cast("long").alias("__ic"),
            F.col("last_item_ts").alias("__li"),
        )
        base = (
            base.join(F.broadcast(stats), "url_hash", "left")
            .withColumn("item_count", F.coalesce(F.col("__ic"), F.lit(0).cast("long")))
            .withColumn("last_item_ts", F.col("__li"))
            .drop("__ic", "__li")
        )
    return base.select(*[f.name for f in PAGES.fields])


def to_corpus(fetched: DataFrame) -> DataFrame:
    """FETCH_RESULT (status 200) -> corpus rows keyed by canonical URL,
    phash computed by decode in the SAME mapInPandas pass (the normalize
    step of input_hint). Single narrow stage: image payload bytes are
    never shuffled — at 100 TB the payload column dominates row size, so
    any join/repartition carrying `bytes` would be the bottleneck."""
    ok = fetched.filter(F.col("status") == 200).select(
        F.col("url").alias("image_id"), "bytes", "w", "h", "fmt", "caption"
    )
    cols = [f.name for f in CORPUS.fields]

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.copy()
            pdf["phash"] = np.asarray(
                [kernels.phash64(kernels.decode_image(bytes(b))) for b in pdf["bytes"]],
                dtype="int64",
            )
            yield pdf[cols]

    return ok.mapInPandas(_dec, CORPUS)


def to_metrics(fetched: DataFrame, as_of_ts) -> DataFrame:
    """Daily snapshot rows keyed (url_hash, yyyymmdd) — last-writer-wins
    at MERGE (ref views/subscribers collections, channel_scraper.rs:
    201-245)."""
    ts = F.lit(as_of_ts).cast("timestamp")
    return fetched.filter(F.col("status") == 200).select(
        "url_hash",
        F.date_format(ts, "yyyyMMdd").cast("int").alias("yyyymmdd"),
        F.year(ts).alias("year"),
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"),
        ts.alias("ts"),
        "views",
        F.coalesce(F.col("subscribers"), F.lit(0)).alias("subscribers"),
    ).select(*[f.name for f in METRICS_DAILY.fields])


def to_host_edges(fetched: DataFrame) -> DataFrame:
    """(src, dst, w): the batch's host-graph edge increments — one count
    per outlink occurrence on a successfully fetched page, dst resolved
    through the SAME canonicalization the admission path uses (so the
    graph speaks canonical hosts). Feeds the additive host_edges fold
    (queries_graph.fold_edge_counts) when the scheduler maintains the
    host graph; ranks derive from the folded table at maintenance ticks.
    One explode + one partial-aggregated groupBy — the count combines
    map-side, so a hot host's fan-out never concentrates in one task."""
    links = fetched.filter(F.col("status") == 200).select(
        F.col("host_hash").alias("src"), F.explode("outlinks").alias("raw_url")
    )
    return (
        links.withColumn("dst", url_hash_udf(host_udf(canonical_url_udf("raw_url"))))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


def discover_candidates(
    fetched: DataFrame, universe: int = 10_000, extra: DataFrame | None = None
) -> DataFrame:
    """Explode outlinks into canonical, hashed candidates with snippet
    text for admission (S10-shaped explode; min depth per URL when many
    parents discover the same target in one batch). `extra` merges
    additional (raw_url, depth) sources — robots Sitemap directives —
    into the stream before canonicalization, so the min-depth agg and
    every admission gate treat them as one population."""
    links = fetched.filter(F.col("status") == 200).select(
        F.explode("outlinks").alias("raw_url"),
        (F.col("depth") + 1).alias("depth"),
    )
    if extra is not None:
        links = links.unionByName(
            extra.select("raw_url", F.col("depth").cast(dict(links.dtypes)["depth"]))
        )
    raw = (
        links
        .withColumn("url", canonical_url_udf("raw_url"))
        .groupBy("url")
        .agg(F.min("depth").alias("depth"))
    )
    cand = (
        raw.withColumn("url_hash", url_hash_udf("url"))
        .withColumn("host", host_udf("url"))
        .withColumn("host_hash", url_hash_udf("host"))
    )
    snippets = snippet_fetch(cand.select("url"), universe)
    return cand.join(snippets, "url")
