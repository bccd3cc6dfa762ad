"""Scale-pattern queries: skew-defusing salted aggregation and the
reference's composite video-refresh plan (SURVEY §3.3) — oracle-checked.

The salting pattern here is the north_rule's hot-key answer for
AGGREGATIONS (the frontier pop bounds hot hosts by construction with
row_number <= k; fetch fan-out is round-robin; this covers the third
shape: a grouped aggregate where one key dominates)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawler_spark.queries import _t, register

_SALT = 16


@register(
    "salted_heavy_hitters",
    """
    SELECT event_type, count(*) AS n, round(1e-9 + sum(value), 4) AS total
    FROM events GROUP BY event_type
    """,
)
def q_salted_heavy_hitters(spark, sf_dir):
    """Two-stage salted aggregation over a low-cardinality (hot) key:
    stage 1 groups by (key, salt) so every reducer sees ~1/SALT of a hot
    key's rows; stage 2 merges the partials. Results are identical to the
    direct groupBy — salting is invisible in output, which is exactly
    what the oracle checks. (Spark's partial/hash agg already map-side
    combines; explicit salting is the pattern for when the FINAL
    per-key state is itself too big for one reducer — e.g. collect_set
    or exact distinct on a hot host at 10^10 scale.)"""
    ev = _t(spark, sf_dir, "events").withColumn(
        "__salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALT))
    )
    partial = ev.groupBy("event_type", "__salt").agg(
        F.count("*").alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pv") + F.lit(1e-9), 4).alias("total"),
    )


@register(
    "merge_partial_update",
    """
    WITH updates AS (
      SELECT o_orderkey, 'P' AS new_status
      FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT b.o_orderkey,
           coalesce(u.new_status, b.o_orderstatus) AS o_orderstatus,
           round(b.o_totalprice, 4) AS o_totalprice
    FROM orders b LEFT JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def q_merge_partial_update(spark, sf_dir):
    """S15: MERGE ... WHEN MATCHED THEN UPDATE SET <subset> (no insert) —
    the reference's partial $set write-back (channel_repo.rs:143-181).
    Exactly what tables.merge_update_cols executes: left join + coalesce
    per updated column, untouched columns pass through."""
    from crawler_spark.tables import merge_update_cols

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 4).alias("o_totalprice")
    )
    updates = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select("o_orderkey", F.lit("P").alias("o_orderstatus"))
    )
    return merge_update_cols(orders, updates, "o_orderkey")


@register(
    "rollup_metrics",
    """
    SELECT coalesce(event_type, '<all>') AS event_type,
           coalesce(strftime(ts, '%Y%m%d')::INT, -1) AS yyyymmdd,
           count(*) AS n, round(1e-9 + sum(value), 4) AS total
    FROM events
    GROUP BY ROLLUP(event_type, strftime(ts, '%Y%m%d')::INT)
    """,
)
def q_rollup_metrics(spark, sf_dir):
    """ROLLUP over the metrics dimensions (type, day) — subtotals + grand
    total in one pass (Catalyst expands grouping sets; the reference has
    no such operator, Spark gives it free — SURVEY §2.4 note)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "yyyymmdd", F.date_format("ts", "yyyyMMdd").cast("int")
    )
    return (
        ev.rollup("event_type", "yyyymmdd")
        .agg(F.count("*").alias("n"), F.round(F.sum("value") + F.lit(1e-9), 4).alias("total"))
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("yyyymmdd", F.lit(-1)).alias("yyyymmdd"),
            "n",
            "total",
        )
    )


@register(
    "distinct_frontier_cardinality",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_distinct_frontier_cardinality(spark, sf_dir):
    """Exact distinct-count per key (frontier-cardinality metrics shape;
    Catalyst plans expand+two-phase agg). The approximate cousin is
    approx_count_distinct (HLL) — not oracle-comparable across engines,
    so the exact form is the checked one."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_PAGE = 50

_PAGINATE_SQL = f"""
    SELECT doc_id, i::INT AS page_no,
           len(w[(i*{_PAGE}+1):((i+1)*{_PAGE})]) AS n_words
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
          FROM documents),
         LATERAL (SELECT unnest(range(0, greatest(cast(ceil(len(w)/{_PAGE}.0) AS BIGINT), 1))) AS i) t
"""


@register("paginated_explode", _PAGINATE_SQL)
def q_paginated_explode(spark, sf_dir):
    """S10: paginated-source explode — a response split into fixed-size
    pages, one row per page with its index (ref youtube_service.rs:48-102
    pages subscriptions 50 at a time until no nextPageToken; here the
    page loop becomes sequence+transform+posexplode, fully JVM-side)."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.trim(F.lower("text")), r"\s+")
    ).withColumn(
        "n_pages", F.greatest(F.ceil(F.size("w") / _PAGE), F.lit(1)).cast("int")
    )
    pages = F.transform(
        F.sequence(F.lit(0), F.col("n_pages") - 1),
        lambda i: F.size(F.slice("w", i * _PAGE + 1, _PAGE)),
    )
    return docs.select(
        "doc_id", F.posexplode(pages).alias("page_no", "n_words")
    ).select("doc_id", "page_no", "n_words")


_AS_OF = "2024-01-31 00:00:00"
_WEEK = 7 * 86400

_REFRESH_SQL = f"""
    WITH feed AS (
      SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    ),
    existing AS (
      SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey % 3 = 0
    ),
    joined AS (
      SELECT f.l_orderkey, f.l_linenumber,
             date_diff('second', f.l_shipdate, TIMESTAMP '{_AS_OF}') AS age_secs,
             e.o_orderkey IS NULL AS is_new,
             date_diff('second', e.o_orderdate, TIMESTAMP '{_AS_OF}') AS since_update
      FROM feed f LEFT JOIN existing e ON f.l_orderkey = e.o_orderkey
    )
    SELECT l_orderkey, l_linenumber
    FROM joined
    WHERE is_new OR since_update >= (CASE
        WHEN age_secs >= 24*{_WEEK} THEN 4*{_WEEK}
        WHEN age_secs >= 4*{_WEEK} THEN {_WEEK}
        WHEN age_secs >= {_WEEK} THEN 86400
        ELSE 3*3600 END)
"""


@register("video_refresh_policy", _REFRESH_SQL)
def q_video_refresh_policy(spark, sf_dir):
    """The reference's video-refresh dataflow (SURVEY §3.3) as one plan:
    feed entries LEFT JOIN existing items (J1, broadcast build side —
    ref video_repo.rs:26-53 HashMap probe), then the age-bucketed
    staleness predicate P9 (ref video_scraper.rs:99-130) decides which
    entries to upsert. Single broadcast join + codegen CASE — no shuffle
    of the feed."""
    as_of = F.lit(_AS_OF).cast("timestamp")
    feed = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate")
    existing = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select(F.col("o_orderkey").alias("e_key"), "o_orderdate")
    )
    j = feed.join(F.broadcast(existing), feed.l_orderkey == existing.e_key, "left")
    age = F.unix_timestamp(as_of) - F.unix_timestamp("l_shipdate")
    since = F.unix_timestamp(as_of) - F.unix_timestamp("o_orderdate")
    thr = (
        F.when(age >= 24 * _WEEK, F.lit(4 * _WEEK))
        .when(age >= 4 * _WEEK, F.lit(_WEEK))
        .when(age >= _WEEK, F.lit(86400))
        .otherwise(F.lit(3 * 3600))
    )
    keep = F.col("e_key").isNull() | (since >= thr)
    return j.filter(keep).select("l_orderkey", "l_linenumber")


_FEED_NS = ('<feed xmlns:yt="http://www.youtube.com/xml/schemas/2015" '
            'xmlns:media="http://search.yahoo.com/mrss/">')

_XML_FEED_SQL = f"""
    WITH feeds AS (
      SELECT doc_id,
             '{_FEED_NS}' ||
             list_aggregate(list_transform(range(1, (doc_id % 4 + 1)::INT + 1), i ->
               '<entry><yt:videoId>v-' || doc_id || '-' || i ||
               '</yt:videoId><title>item ' || i ||
               '</title><published>' ||
               (1600000000 + ((doc_id * 100 + i) * 86400) % 200000000) ||
               '</published><media:group><media:statistics views="' ||
               ((doc_id * 31 + i * 7) % 1000) ||
               '"/></media:group></entry>'), 'string_agg', '')
             || '</feed>' AS payload
      FROM documents
    ),
    stripped AS (
      SELECT doc_id, regexp_replace(payload, '(yt|media):', '\\1', 'g') AS xml
      FROM feeds
    ),
    entries AS (
      SELECT doc_id, unnest(regexp_extract_all(xml, '<entry>.*?</entry>')) AS e
      FROM stripped
    )
    SELECT doc_id,
           regexp_extract(e, '<ytvideoId>(.*?)</ytvideoId>', 1) AS item_id,
           make_timestamp(regexp_extract(e, '<published>([0-9]+)</published>', 1)::BIGINT
                          * 1000000) AS published_ts,
           regexp_extract(e, 'views="([0-9]+)"', 1)::BIGINT AS views
    FROM entries
"""


@register("xml_feed_parse", _XML_FEED_SQL)
def q_xml_feed_parse(spark, sf_dir):
    """S11 + F9 + §2.10-3: parse a namespaced XML feed STRING into typed,
    exploded entries (ref src/scraper/video_scraper.rs:132-158; namespace
    strip :145-149). Both engines BUILD the same payload string from
    doc_id arithmetic, then the Spark side runs the engine's real parse
    pipeline — Catalyst regexp_replace namespace strip, Arrow-batched
    ElementTree parse UDF, explode — while the oracle re-extracts the
    fields with DuckDB regexps. The payload never shuffles; only typed
    entry rows flow out."""
    from crawler_spark.operators import parse as parse_op

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    k = (F.col("doc_id") % 4 + 1).cast("int")
    entry = lambda i: F.concat(
        F.lit("<entry><yt:videoId>v-"),
        F.col("doc_id").cast("string"),
        F.lit("-"),
        i.cast("string"),
        F.lit("</yt:videoId><title>item "),
        i.cast("string"),
        F.lit("</title><published>"),
        (F.lit(1_600_000_000) + ((F.col("doc_id") * 100 + i) * 86400) % 200_000_000)
        .cast("string"),
        F.lit('</published><media:group><media:statistics views="'),
        ((F.col("doc_id") * 31 + i * 7) % 1000).cast("string"),
        F.lit('"/></media:group></entry>'),
    )
    payload = F.concat(
        F.lit(_FEED_NS),
        F.array_join(F.transform(F.sequence(F.lit(1), k), entry), ""),
        F.lit("</feed>"),
    )
    feeds = docs.select("doc_id", payload.alias("feed_xml"))
    return parse_op.parse_feed(feeds, key_col="doc_id").select(
        "doc_id", "item_id", "published_ts", "views"
    )


@register(
    "host_depth_histogram",
    """
    WITH c AS (
      SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2
    ),
    h AS (
      SELECT event_type, len(CAST(n AS VARCHAR)) AS digits,
             count(*) AS n_hosts, min(n) AS min_depth, max(n) AS max_depth,
             CAST(sum(n) AS BIGINT) AS urls
      FROM c GROUP BY 1, 2
    )
    SELECT event_type, digits, n_hosts, min_depth, max_depth, urls,
           round(1e-9 + urls * 1.0 / (SELECT sum(n) FROM c), 4) AS share
    FROM h
    """,
)
def q_host_depth_histogram(spark, sf_dir):
    """Frontier skew MONITORING (the report that drives salting /
    per-host caps at 10^10-frontier scale): per-host queue-depth
    histogram in decade buckets — how many hosts hold 1-9, 10-99,
    100-999, ... queued URLs and what share of the frontier each band
    owns. Built from two hash aggregations and a broadcast 1-row total:
    fully parallel, no global sort/ntile (a quantile sketch would need
    a single-task window at this cardinality), and the decade bucket is
    integer/string arithmetic — no floor(log()) float boundary to
    disagree across engines. A fat tail band here is the signal to
    raise _SALT or tighten per-host pop caps before a reducer sees a
    hot host's full queue."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    return decade_rollup(c)


def decade_rollup(per_host):
    """Decade histogram over per-host counts (one row per host, column
    `n`) — the ONE definition shared by the batch host_depth_histogram
    query and the streaming twin's sink rollup (streams.
    host_depth_counts), so the two cannot drift. Stateless: two hash
    aggs + a broadcast 1-row total over an already host-sized input."""
    h = per_host.groupBy(
        "event_type", F.length(F.col("n").cast("string")).alias("digits")
    ).agg(
        F.count(F.lit(1)).alias("n_hosts"),
        F.min("n").alias("min_depth"),
        F.max("n").alias("max_depth"),
        F.sum("n").alias("urls"),
    )
    tot = per_host.agg(F.sum("n").alias("tot"))
    return h.crossJoin(F.broadcast(tot)).select(
        "event_type", "digits", "n_hosts", "min_depth", "max_depth", "urls",
        F.round(F.col("urls") / F.col("tot") + F.lit(1e-9), 4).alias("share"),
    )


_DEPTH_QS = (0.5, 0.9, 0.99)

_DEPTH_Q_SQL = """
    WITH c AS (
      SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2
    )
    SELECT event_type, count(*) AS n_hosts,
           round(1e-9 + quantile_cont(n, 0.5), 4) AS p50,
           round(1e-9 + quantile_cont(n, 0.9), 4) AS p90,
           round(1e-9 + quantile_cont(n, 0.99), 4) AS p99,
           max(n) AS max_depth
    FROM c GROUP BY event_type
"""


@register("frontier_depth_quantiles", _DEPTH_Q_SQL)
def q_frontier_depth_quantiles(spark, sf_dir):
    """Exact interpolated p50/p90/p99 of per-host queue depth per
    event_type — the skew monitor's tail summary, computed WITHOUT
    Spark's exact `percentile` aggregate (which buffers every group
    value in one agg buffer: O(hosts) task memory at 10^8 hosts).
    Instead: one sort-shuffle row_number window over the host-sized
    counts, per-group (n_hosts, max) from a bounded hash agg, and the
    three quantile positions h = p*(n_hosts-1) resolved by TWO broadcast
    positional joins (rank == floor(h)+1 and +2) with linear
    interpolation — quantile_cont semantics, constant memory per task.
    Matches DuckDB quantile_cont bit-for-bit at 4dp."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    stats = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hosts"), F.max("n").alias("max_depth")
    )
    ranked = c.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("n"))
    ).select("event_type", "rn", F.col("n").cast("double").alias("v"))
    h = F.col("p") * (F.col("n_hosts") - 1)
    probes = stats.select(
        "event_type", "n_hosts",
        F.explode(F.array(*[F.lit(p) for p in _DEPTH_QS])).alias("p"),
    ).select(
        "event_type", "p",
        (F.floor(h) + 1).cast("int").alias("lo"),
        (h - F.floor(h)).alias("frac"),
    )
    lo = ranked.withColumnRenamed("rn", "lo").withColumnRenamed("v", "v_lo")
    hi = ranked.select(
        "event_type", (F.col("rn") - 1).alias("lo"), F.col("v").alias("v_hi")
    )
    val = F.col("v_lo") + F.col("frac") * (
        F.coalesce(F.col("v_hi"), F.col("v_lo")) - F.col("v_lo")
    )
    q = (
        lo.join(F.broadcast(probes), ["event_type", "lo"])
        .join(hi, ["event_type", "lo"], "left")
        .select("event_type", "p", F.round(val + F.lit(1e-9), 4).alias("q"))
    )
    piv = q.groupBy("event_type").agg(
        *[
            F.max(F.when(F.col("p") == F.lit(p), F.col("q"))).alias(name)
            for p, name in zip(_DEPTH_QS, ("p50", "p90", "p99"))
        ]
    )
    return stats.join(piv, "event_type").select(
        "event_type", "n_hosts", "p50", "p90", "p99", "max_depth"
    )
