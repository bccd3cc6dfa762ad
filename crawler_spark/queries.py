"""Operator-parity query registry (the driver correctness gate).

Each entry pairs a Spark DataFrame program with an ANSI-SQL oracle that
DuckDB runs over the same parquet tables. Names map to SURVEY.md §2
operator ids; reference citations are in each docstring.

Portability rules that make value-hash comparison possible:
  - every computed column is aliased IDENTICALLY on both sides;
  - doubles are round()ed to a fixed precision on both sides;
  - all hashing uses the md5-prefix trick:
      Spark : conv(substring(md5(x),1,15),16,10) cast long
      DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT
  - limits / window ranks always carry a deterministic tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn
    return deco


# -- cache hygiene ----------------------------------------------------------
# Registry queries may persist intermediates (a DataFrame feeding two plan
# branches). A 60-query sweep must not accumulate cached blocks, so every
# such persist is TRACKED and released by cleanup_caches() — which sweeps,
# tests and benches call when they are done with the returned DataFrames.

_TRACKED: list[DataFrame] = []
_CLEANUP_HOOKS: list[Callable[[], None]] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() a query intermediate and register it for cleanup_caches()."""
    df.persist()
    _TRACKED.append(df)
    return df


def add_cleanup_hook(fn: Callable[[], None]) -> None:
    """Register extra cache-release work (e.g. memo dicts holding persisted
    results) to run inside cleanup_caches()."""
    _CLEANUP_HOOKS.append(fn)


def cleanup_caches() -> None:
    """Unpersist every tracked intermediate and clear registered memos.
    After this, a sweep's SparkContext should hold zero cached RDDs."""
    for hook in _CLEANUP_HOOKS:
        hook()
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass


# -- localCheckpoint hygiene ------------------------------------------------
# DataFrame.localCheckpoint() materializes into persisted RDD blocks that
# DataFrame.unpersist() does NOT release (the checkpointed RDD is below the
# plan cache). An RDD-id fence bounds a region; releasing the ids that
# appeared inside it frees exactly that region's blocks.

def rdd_ids(sc) -> set:
    """Ids of currently-persisted RDDs (both cached plans and local
    checkpoints)."""
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


def release_rdds(sc, ids) -> None:
    """Unpersist the given RDD ids (no-op for ids already gone). Only
    call once nothing will recompute from the released blocks."""
    m = sc._jsc.getPersistentRDDs()
    for i in ids:
        r = m.get(int(i))
        if r is not None:
            r.unpersist(False)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def md5h(col: Column) -> Column:
    """60-bit md5-prefix hash, bit-identical to the DuckDB expression
    ('0x'||substr(md5(x),1,15))::BIGINT (see kernels.url_hash64)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


MD5H_SQL = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


# ===========================================================================
# §2.1 Scans / top-k / point lookups (S1-S7)
# ===========================================================================

@register(
    "filter_range_scan",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_totalprice >= 50000
    """,
)
def q_filter_range_scan(spark, sf_dir):
    """S3: filtered+projected scan (ref channel_repo.rs:46-72 — recrawl
    seed selection `lastUploadAt >= cutoff AND subscribers >= 8000`).
    Both predicates reach the parquet scan as PushedFilters."""
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= F.lit("1998-01-01")) & (F.col("o_totalprice") >= 50000))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "frontier_pop_topk",
    """
    SELECT event_id, user_id, ts
    FROM events
    WHERE ts < TIMESTAMP '2024-01-20'
    ORDER BY ts ASC, event_id ASC
    LIMIT 100
    """,
)
def q_frontier_pop_topk(spark, sf_dir):
    """S4/O1: the frontier pop — filter ready, order by staleness asc,
    take 100, with a deterministic tiebreak (ref channel_repo.rs:74-108:
    `lastCrawl < now-1d`, sort lastCrawl asc, limit 100). Spark physical
    plan: TakeOrderedAndProject (no full sort, no full shuffle)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit("2024-01-20"))
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .limit(100)
        .select("event_id", "user_id", "ts")
    )


@register(
    "frontier_pop_adaptive",
    """
    WITH f AS (
      SELECT event_type, event_id, ts FROM events
      WHERE ts <= TIMESTAMP '2024-01-20'
    ),
    d AS (SELECT event_type, count(*) AS depth FROM f GROUP BY 1),
    r AS (
      SELECT event_type, event_id, ts,
             row_number() OVER (
               PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS rn
      FROM f
    )
    SELECT r.event_type, r.event_id, r.ts
    FROM r JOIN d USING (event_type)
    WHERE rn <= 2 * len(CAST(depth AS VARCHAR))
    """,
)
def q_frontier_pop_adaptive(spark, sf_dir):
    """S4/W1 adaptive variant: the depth-decade pop cap — each host's
    per-batch take is k * digits(its ready-queue depth), the
    host_depth_histogram skew signal fed back into the pop (a host with
    10^d queued URLs drains (d+1)x faster instead of starving behind a
    flat cap). Runs the REAL frontier.pop(adaptive=True) operator:
    literal-bounded WindowGroupLimit rank + a map-side-combined
    (host, count) depth agg broadcast back; integer digits() bucketing —
    no float log boundary to disagree across engines. Events stand in as
    the frontier: event_type=host, ts=next_fetch_ts, event_id=url_hash."""
    from crawler_spark.operators import frontier as frontier_op

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("host_hash"),
        F.lit(0).alias("priority"),
        F.col("ts").alias("next_fetch_ts"),
        F.col("event_id").alias("url_hash"),
    )
    popped = frontier_op.pop(ev, "2024-01-20", k_per_host=2, adaptive=True)
    return popped.select(
        F.col("host_hash").alias("event_type"),
        F.col("url_hash").alias("event_id"),
        F.col("next_fetch_ts").alias("ts"),
    )


@register(
    "point_lookup",
    "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42",
)
def q_point_lookup(spark, sf_dir):
    """S5: point lookup by key (ref channel_repo.rs:110-124 find_one)."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_acctbal")
    )


@register(
    "argmin_least_used",
    """
    SELECT s_suppkey, s_nationkey, round(s_acctbal, 4) AS acctbal
    FROM supplier
    ORDER BY s_nationkey ASC, s_acctbal ASC, s_suppkey ASC
    LIMIT 1
    """,
)
def q_argmin_least_used(spark, sf_dir):
    """S7/O2/A4: least-used politeness token = top-1 by composite key
    (ref apikeys_repo.rs:25-37 sort (pdt_day, used_quota) asc limit 1)."""
    return (
        _t(spark, sf_dir, "supplier")
        .orderBy("s_nationkey", "s_acctbal", "s_suppkey")
        .limit(1)
        .select("s_suppkey", "s_nationkey", F.round("s_acctbal", 4).alias("acctbal"))
    )


@register(
    "watermark_default",
    """
    SELECT coalesce(max(ts), TIMESTAMP '2023-12-31 00:00:00') AS watermark_ts
    FROM events WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-02'
    """,
)
def q_watermark_default(spark, sf_dir):
    """S6: watermark read with default (ref settings_repo.rs:25-40 —
    lastDiscoveryCrawl, default now-1d-1s when unset)."""
    return (
        _t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "signup") & (F.col("ts") < F.lit("2024-01-02")))
        .agg(F.coalesce(F.max("ts"), F.lit("2023-12-31 00:00:00").cast("timestamp")).alias("watermark_ts"))
    )


# ===========================================================================
# §2.3 Joins (J1-J6)
# ===========================================================================

@register(
    "lookup_left_join",
    """
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate >= TIMESTAMP '2000-01-01'
    """,
)
def q_lookup_left_join(spark, sf_dir):
    """J1: broadcast left outer hash join (ref video_repo.rs:26-53 builds
    HashMap<video_id,updatedAt>, probed per feed entry). The small side is
    explicitly broadcast: no shuffle of the big side."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")
    )


@register(
    "seen_anti_join",
    """
    SELECT o_orderkey FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    """,
)
def q_seen_anti_join(spark, sf_dir):
    """J2: URL-seen dedup as anti join (ref channel_discovery_crawler.rs:
    120-125 — `!channels.exists && !additional.exists` per candidate; ours
    is one set-wise anti join instead of 2 point reads per candidate).
    Formulated as orders lacking any returned ('R') lineitem so the result
    is non-empty on the driver's testdata (every customer has orders there,
    which made the customer-side form vacuous)."""
    orders = _t(spark, sf_dir, "orders")
    returned = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_anti")
        .select("o_orderkey")
    )


@register(
    "blacklist_semi_join",
    """
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_blacklist_semi_join(spark, sf_dir):
    """J4: membership as left-semi join (ref sailing_terms_service.rs:64-71
    blacklist Vec contains)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select("c_custkey")


_TERMS = ["spark", "join", "window", "hash"]

@register(
    "term_theta_join",
    f"""
    SELECT d.doc_id,
           max(CASE WHEN contains(lower(d.text), t.term) THEN 1 ELSE 0 END) = 1 AS has_term
    FROM documents d
    CROSS JOIN (VALUES {", ".join(f"('{t}')" for t in _TERMS)}) AS t(term)
    GROUP BY d.doc_id
    """,
)
def q_term_theta_join(spark, sf_dir):
    """J5: broadcast nested-loop theta join — substring containment against
    a term vocabulary (ref sailing_terms_service.rs:47-54: per-term
    `title.contains(term) || description.contains(term)`)."""
    docs = _t(spark, sf_dir, "documents")
    terms = docs.sparkSession.createDataFrame([(t,) for t in _TERMS], ["term"])
    return (
        docs.crossJoin(F.broadcast(terms))
        .groupBy("doc_id")
        .agg((F.max(F.when(F.lower(F.col("text")).contains(F.col("term")), 1).otherwise(0)) == 1).alias("has_term"))
    )


@register(
    "robots_admission",
    """
    WITH cand AS (
      SELECT o_orderkey AS url_hash,
             o_custkey % 97 AS host_hash,
             'http://h' || (o_custkey % 97) || '.test/'
               || lower(replace(o_orderpriority, ' ', '-'))
               || '/p' || o_orderkey AS url,
             '/' || lower(replace(o_orderpriority, ' ', '-'))
               || '/p' || o_orderkey AS path
      FROM orders
    )
    SELECT url_hash, host_hash, url FROM cand
    WHERE CASE
      WHEN host_hash % 5 = 4 THEN TRUE                  -- no rules: allowed
      WHEN path LIKE '/1-urgent%' THEN host_hash % 3 = 0 -- longest prefix
      ELSE host_hash % 2 = 0                             -- the '/' rule
    END
    """,
)
def q_robots_admission(spark, sf_dir):
    """North-rule robots compliance as a checked query: the REAL
    operators.robots.filter_allowed (broadcast rules join + explode +
    longest-matching-prefix max_by verdict, ref blacklist deny semantics
    src/repos/blacklist_repo.rs:20-35 generalized to per-path rules) run
    over candidate URLs and a rules table both derived deterministically
    from the orders table, so the DuckDB oracle can state the
    longest-prefix-wins verdict in closed form. Hosts ≡4 (mod 5) carry
    NO rules row (default allow, the explode_outer branch); every ruled
    host has a '/' rule (allow iff host even) shadowed by a longer
    '/1-urgent' rule (allow iff host ≡0 mod 3) on urgent paths."""
    from crawler_spark.operators.robots import filter_allowed

    o = _t(spark, sf_dir, "orders")
    host = (F.col("o_custkey") % 97).cast("long")
    cand = o.select(
        F.col("o_orderkey").cast("long").alias("url_hash"),
        host.alias("host_hash"),
        F.concat(
            F.lit("http://h"), host.cast("string"), F.lit(".test/"),
            F.lower(F.translate(F.col("o_orderpriority"), " ", "-")),
            F.lit("/p"), F.col("o_orderkey").cast("string"),
        ).alias("url"),
    )
    h = F.col("host_hash")
    rules = (
        cand.select("host_hash").distinct()
        .filter(h % 5 != 4)
        .select(
            "host_hash",
            F.array(
                F.struct((h % 2 == 0).alias("allow"), F.lit("/").alias("path_prefix")),
                F.struct((h % 3 == 0).alias("allow"), F.lit("/1-urgent").alias("path_prefix")),
            ).alias("rules"),
        )
    )
    return filter_allowed(cand, rules)


# ===========================================================================
# §2.4 Aggregations (A1-A6)
# ===========================================================================

@register(
    "count_by_key",
    "SELECT l_orderkey, count(*) AS item_count FROM lineitem GROUP BY l_orderkey",
)
def q_count_by_key(spark, sf_dir):
    """A1: per-key count (ref video_repo.rs:76-82 count_documents by
    channel -> videoCount). Partial (map-side) agg then final — one
    shuffle of pre-aggregated data only."""
    return _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(F.count("*").alias("item_count"))


@register(
    "max_by_key",
    "SELECT l_orderkey, max(l_shipdate) AS last_item_ts FROM lineitem GROUP BY l_orderkey",
)
def q_max_by_key(spark, sf_dir):
    """A3: running max per key (ref video_scraper.rs:36-41,55-57 —
    lastUploadAt = max(published))."""
    return _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_item_ts"))


@register(
    "quota_accumulate",
    """
    SELECT user_id, count(*) AS requests, round(sum(value), 4) AS spent
    FROM events GROUP BY user_id
    """,
)
def q_quota_accumulate(spark, sf_dir):
    """A6: per-host quota accumulation (ref apikeys_repo.rs:47-51
    `$inc used_quota` per request, set-wise)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("requests"), F.round(F.sum("value"), 4).alias("spent"))
    )


@register(
    "pricing_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(1e-9 + avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_rollup(spark, sf_dir):
    """TPC-H Q1-shaped rollup: the bench headline aggregate. Exercises
    map-side partial aggregation + whole-stage codegen arithmetic."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
        F.round(F.avg("l_discount") + F.lit(1e-9), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# ===========================================================================
# §2.5 Windows (W1-W2)
# ===========================================================================

@register(
    "window_topk_per_key",
    """
    SELECT user_id, event_id, round(value, 4) AS value
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def q_window_topk_per_key(spark, sf_dir):
    """W1: per-host frontier pop — rank within partition, take k, with
    deterministic tiebreak (ref channel_repo.rs:80-83 generalized from
    global to per-host; this is the scale-out shape of the pop)."""
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", F.round("value", 4).alias("value"))
    )


@register(
    "daily_snapshot_last",
    """
    SELECT user_id, yyyymmdd, round(value, 4) AS last_value
    FROM (
      SELECT user_id, strftime(ts, '%Y%m%d')::INT AS yyyymmdd, value,
             row_number() OVER (
               PARTITION BY user_id, strftime(ts, '%Y%m%d')::INT
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_daily_snapshot_last(spark, sf_dir):
    """W2/A5: last-writer-wins daily snapshot, one row per (key, day)
    (ref channel_scraper.rs:201-245 upsert keyed {channel, yyyymmdd})."""
    df = _t(spark, sf_dir, "events").withColumn(
        "yyyymmdd", F.date_format("ts", "yyyyMMdd").cast("int")
    )
    w = Window.partitionBy("user_id", "yyyymmdd").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "yyyymmdd", F.round("value", 4).alias("last_value"))
    )


# ===========================================================================
# §2.7 Set ops + §2.2 predicates
# ===========================================================================

@register(
    "union_sources",
    """
    SELECT 'errors' AS source, event_id, user_id FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT 'purchases' AS source, event_id, user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_union_sources(spark, sf_dir):
    """Set op: the three crawl producers union into one scraper stream
    (ref main.rs:87-106 — three producers, one tx), tagged by source."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select(
        F.lit("errors").alias("source"), "event_id", "user_id"
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.lit("purchases").alias("source"), "event_id", "user_id"
    )
    return a.unionByName(b)


@register(
    "staleness_buckets",
    """
    SELECT CASE
             WHEN age_secs >= 24*7*86400 THEN 4*7*86400
             WHEN age_secs >= 4*7*86400 THEN 7*86400
             WHEN age_secs >= 7*86400 THEN 86400
             ELSE 3*3600
           END AS refresh_secs,
           count(*) AS n
    FROM (
      SELECT date_diff('second', ts, TIMESTAMP '2024-01-31') AS age_secs FROM events
    ) GROUP BY 1
    """,
)
def q_staleness_buckets(spark, sf_dir):
    """P9: the age-bucketed refresh policy as a CASE expression — this is
    the frontier's recrawl-priority function (ref video_scraper.rs:99-130;
    thresholds 3h/<1w, 1d/>=1w, 1w/>=4w, 4w/>=24w)."""
    W_ = 7 * 86400
    df = _t(spark, sf_dir, "events").withColumn(
        "age_secs",
        F.unix_timestamp(F.lit("2024-01-31").cast("timestamp")) - F.unix_timestamp(F.col("ts")),
    )
    refresh = (
        F.when(F.col("age_secs") >= 24 * W_, F.lit(4 * W_))
        .when(F.col("age_secs") >= 4 * W_, F.lit(W_))
        .when(F.col("age_secs") >= W_, F.lit(86400))
        .otherwise(F.lit(3 * 3600))
    )
    return df.groupBy(refresh.alias("refresh_secs")).agg(F.count("*").alias("n"))


@register(
    "quota_day_pacific",
    """
    SELECT strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/Los_Angeles', '%Y%m%d')::INT AS pdt_day,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_quota_day_pacific(spark, sf_dir):
    """F7: Pacific-calendar quota day (ref apikeys_repo.rs:40-45 —
    Utc::now().with_timezone(&Pacific).format('%Y%m%d'))."""
    df = _t(spark, sf_dir, "events").withColumn(
        "pdt_day",
        F.date_format(F.from_utc_timestamp("ts", "America/Los_Angeles"), "yyyyMMdd").cast("int"),
    )
    return df.groupBy("pdt_day").agg(F.count("*").alias("n"))


@register(
    "date_parts",
    """
    SELECT year(ts) AS year, month(ts) AS month, day(ts) AS day, count(*) AS n
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_date_parts(spark, sf_dir):
    """F8: y/m/d extraction for the metrics key (ref channel_scraper.rs:
    211-213,234-236)."""
    df = _t(spark, sf_dir, "events")
    return df.groupBy(
        F.year("ts").alias("year"), F.month("ts").alias("month"), F.dayofmonth("ts").alias("day")
    ).agg(F.count("*").alias("n"))


@register(
    "parse_cast_json",
    """
    SELECT event_type, round(1e-9 + avg(regexp_extract(props, '[0-9]+')::BIGINT), 4) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def q_parse_cast_json(spark, sf_dir):
    """F4: numeric-in-string parsing (ref channel_scraper.rs:74-87 —
    YouTube returns counts as strings)."""
    df = _t(spark, sf_dir, "events").withColumn(
        "k", F.regexp_extract("props", "[0-9]+", 0).cast("long")
    )
    return df.groupBy("event_type").agg(F.round(F.avg("k") + F.lit(1e-9), 4).alias("avg_k"))


@register(
    "json_props_parse",
    """
    SELECT k_bucket, count(*) AS n, min(k) AS min_k, max(k) AS max_k
    FROM (
      SELECT (props::JSON ->> 'k')::BIGINT AS k,
             ((props::JSON ->> 'k')::BIGINT) % 10 AS k_bucket
      FROM events
    ) GROUP BY k_bucket
    """,
)
def q_json_props_parse(spark, sf_dir):
    """S9/§2.10-3 JSON payload parse, TYPED: from_json into a struct
    schema (JsonToStructs, JVM-side — no regex, no Python), then
    aggregate over the extracted field. The typed twin of
    parse_cast_json's regex form — this is the path a JSON API source
    (ref youtube_service.rs response structs) takes: payload string ->
    typed columns -> downstream relational ops, with parse errors
    surfacing as NULLs (PERMISSIVE mode) instead of failed tasks."""
    df = _t(spark, sf_dir, "events").withColumn(
        "k", F.from_json("props", "k BIGINT").getField("k")
    )
    return (
        df.withColumn("k_bucket", F.col("k") % 10)
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "keyword_tokenize",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '"[^"]+"|[^ ]+')) AS n_keywords
    FROM documents
    """,
)
def q_keyword_tokenize(spark, sf_dir):
    """F3: the quoted-phrase keyword tokenizer as one SQL expression
    (ref utils/keyword_utils.rs:3-18, regex `[\"].+?[\"]|[^ ]+`)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit('"[^"]+"|[^ ]+'), 0)).alias("n_keywords"),
    )


# ===========================================================================
# MERGE / DELETE rewrites (S12-S15) — expressed as the join-rewrites our
# snapshot store executes
# ===========================================================================

@register(
    "merge_upsert",
    """
    WITH base AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 != 0),
         updates AS (SELECT o_orderkey, round(o_totalprice * 1.1, 4) AS new_price
                     FROM orders WHERE o_orderkey % 2 = 0)
    SELECT coalesce(b.o_orderkey, u.o_orderkey) AS o_orderkey,
           round(coalesce(u.new_price, b.o_totalprice), 4) AS o_totalprice
    FROM base b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def q_merge_upsert(spark, sf_dir):
    """S12: MERGE INTO (upsert) as a full-outer-join rewrite — matched
    rows updated, unmatched inserted (ref update_one($set, upsert:true),
    channel_repo.rs:132-141 et al.). This is exactly what
    tables.SnapshotStore.merge() executes."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 3 != 0).select("o_orderkey", "o_totalprice")
    updates = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("u_key"), F.round(F.col("o_totalprice") * 1.1, 4).alias("new_price")
    )
    return (
        base.join(updates, base.o_orderkey == updates.u_key, "full_outer")
        .select(
            F.coalesce(base.o_orderkey, updates.u_key).alias("o_orderkey"),
            F.round(F.coalesce(updates.new_price, base.o_totalprice), 4).alias("o_totalprice"),
        )
    )


@register(
    "cdc_snapshot_diff",
    """
    WITH base AS (SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice
                  FROM orders WHERE o_orderkey % 3 != 0),
         updates AS (SELECT o_orderkey, round(o_totalprice * 1.1, 4) AS o_totalprice
                     FROM orders WHERE o_orderkey % 2 = 0),
         newt AS (
           SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
                  coalesce(u.o_totalprice, b.o_totalprice) AS o_totalprice
           FROM base b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
           WHERE coalesce(u.o_orderkey, b.o_orderkey) % 7 != 0
         ),
         j AS (
           SELECT o.o_orderkey AS ok, o.o_totalprice AS ov,
                  n.o_orderkey AS nk, n.o_totalprice AS nv
           FROM base o FULL OUTER JOIN newt n ON o.o_orderkey = n.o_orderkey
         )
    SELECT ok AS o_orderkey, ov AS o_totalprice, 'delete' AS change_type
    FROM j WHERE nk IS NULL
    UNION ALL
    SELECT nk, nv, 'insert' FROM j WHERE ok IS NULL
    UNION ALL
    SELECT ok, ov, 'update_before'
    FROM j WHERE ok IS NOT NULL AND nk IS NOT NULL AND ov IS DISTINCT FROM nv
    UNION ALL
    SELECT nk, nv, 'update_after'
    FROM j WHERE ok IS NOT NULL AND nk IS NOT NULL AND ov IS DISTINCT FROM nv
    """,
)
def q_cdc_snapshot_diff(spark, sf_dir):
    """CDC / changelog scan between two table versions (Iceberg
    changelog, Delta CDF): old = a keyed orders projection, new = the
    same table after an upsert batch (+10%% price on even keys) and a
    predicate delete (keys %% 7). tables.cdc_diff classifies every key
    as insert / delete / update_before / update_after in ONE full-outer
    join; unchanged rows emit nothing. SnapshotStore.diff runs this
    same transform over only the CHANGED CoW buckets, so a downstream
    consumer (indexer, training-data exporter) re-reads O(changed
    rows) — the incremental-consumption contract the reference's
    MongoDB change streams give its dashboard (src/repos/*_repo.rs
    find-since patterns)."""
    from crawler_spark.tables import cdc_diff, merge_upsert

    orders = _t(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice")
    )
    updates = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice")
    )
    new = merge_upsert(base, updates, "o_orderkey").filter(F.col("o_orderkey") % 7 != 0)
    return cdc_diff(base, new, "o_orderkey").withColumnRenamed(
        "_change_type", "change_type"
    )


@register(
    "cascade_delete",
    """
    SELECT l.l_returnflag, count(*) AS remaining
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    )
    GROUP BY l.l_returnflag
    """,
)
def q_cascade_delete(spark, sf_dir):
    """S13/S14: predicate delete + cascade as anti-join rewrite (ref
    delete_many by channel across videos/views/subscribers,
    channel_scraper.rs:161-168)."""
    li = _t(spark, sf_dir, "lineitem")
    doomed = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        li.join(doomed, li.l_orderkey == doomed.o_orderkey, "left_anti")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("remaining"))
    )


@register(
    "quota_roll_merge",
    """
    SELECT user_id,
           CASE WHEN prev_day < 20240115 THEN requests ELSE prev_used + requests END AS used_quota,
           CASE WHEN prev_day < 20240115 THEN 20240115 ELSE prev_day END AS quota_day
    FROM (
      SELECT user_id,
             count(*) AS requests,
             user_id % 3 + 3 AS prev_used,
             CASE WHEN user_id % 2 = 0 THEN 20240114 ELSE 20240115 END AS prev_day
      FROM events WHERE ts < TIMESTAMP '2024-01-16'
      GROUP BY user_id
    )
    """,
)
def q_quota_roll_merge(spark, sf_dir):
    """S16: conditional inc-or-reset quota merge (ref apikeys_repo.rs:
    39-67 — `$inc used_quota` vs reset on Pacific day roll), set-wise as
    a CASE inside the token-table MERGE."""
    today = 20240115
    df = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit("2024-01-16"))
        .groupBy("user_id")
        .agg(F.count("*").alias("requests"))
        .withColumn("prev_used", F.col("user_id") % 3 + 3)
        .withColumn(
            "prev_day",
            F.when(F.col("user_id") % 2 == 0, F.lit(20240114)).otherwise(F.lit(today)),
        )
    )
    rolled = F.col("prev_day") < today
    return df.select(
        "user_id",
        F.when(rolled, F.col("requests")).otherwise(F.col("prev_used") + F.col("requests")).alias("used_quota"),
        F.when(rolled, F.lit(today)).otherwise(F.col("prev_day")).alias("quota_day"),
    )


@register(
    "crawl_delay_rate_cap",
    """
    WITH led AS (
      SELECT s_suppkey AS host_hash,
             CAST(s_nationkey AS INT) AS used_quota,
             200 + (s_suppkey % 5) * 200 AS min_delay_ms
      FROM supplier
    ),
    cd AS (
      SELECT s_suppkey AS host_hash,
             500 * (1 + s_suppkey % 4) AS crawl_delay_ms
      FROM supplier WHERE s_suppkey % 3 = 0
    )
    SELECT led.host_hash,
           CAST(least(greatest(20 - used_quota, 0),
                      floor(2000.0 / greatest(min_delay_ms,
                                              coalesce(crawl_delay_ms, 0), 1)))
                AS INT) AS budget
    FROM led LEFT JOIN cd USING (host_hash)
    """,
)
def q_crawl_delay_rate_cap(spark, sf_dir):
    """Robots Crawl-delay folded into the pop-time rate cap: the REAL
    operators.politeness.apply_crawl_delay (read-side stricter-of fold,
    broadcast per-host robots dim, the politeness TABLE never rewritten)
    composed with remaining_budget(tick_secs=2) — per-host budget =
    min(quota left today, floor(tick_ms / effective_delay)). Ledger and
    directives derive deterministically from supplier so the DuckDB
    oracle states the stricter-of + floor arithmetic in closed form;
    hosts ≢0 (mod 3) carry NO directive (the left-join NULL branch),
    directives 500..2000 ms straddle the 200..1000 ms ledger delays so
    both the binding and the laxer-than-ledger cases are populated."""
    from crawler_spark.operators import politeness as politeness_op

    s = _t(spark, sf_dir, "supplier")
    led = s.select(
        F.col("s_suppkey").alias("host_hash"),
        F.col("s_nationkey").cast("int").alias("used_quota"),
        F.lit(20).alias("daily_quota"),
        F.lit(20240115).alias("quota_day"),
        (F.lit(200) + (F.col("s_suppkey") % 5) * 200).alias("min_delay_ms"),
    )
    cd = s.filter(F.col("s_suppkey") % 3 == 0).select(
        F.col("s_suppkey").alias("host_hash"),
        (F.lit(500) * (1 + F.col("s_suppkey") % 4)).alias("crawl_delay_ms"),
    )
    # as_of noon UTC = 04:00 Pacific Jan 15 -> quota_day holds (no roll)
    eff = politeness_op.apply_crawl_delay(led, cd)
    return politeness_op.remaining_budget(eff, "2024-01-15 12:00:00", tick_secs=2)


@register(
    "sitemap_discovery",
    """
    WITH hosts AS (
      SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS host_hash
      FROM customer WHERE c_custkey % 7 < 3
    ),
    ruled AS (
      SELECT CAST(n_nationkey AS BIGINT) AS host_hash
      FROM nation WHERE n_nationkey % 2 = 0
    )
    SELECT 'https://h' || ruled.host_hash || '/sitemap/' || s.i AS raw_url,
           CAST(1 AS INT) AS depth
    FROM ruled
    JOIN hosts USING (host_hash)
    CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1) s
    """,
)
def q_sitemap_discovery(spark, sf_dir):
    """Robots Sitemap directives as a discovery source: the REAL
    operators.robots.sitemap_urls_for_hosts (distinct popped hosts
    semi-joined against the broadcast per-host robots dim, sitemap
    arrays exploded to depth-1 candidates). Nation stands in as the
    robots dim (even hosts declare two sitemaps, odd hosts an empty
    array — which must explode to NOTHING) and customer as the popped
    batch (many pops per host — the distinct makes injection per-host,
    not per-pop), so the DuckDB oracle is a closed-form join x {0,1}."""
    from crawler_spark.operators.robots import sitemap_urls_for_hosts

    nat = _t(spark, sf_dir, "nation")
    h = F.col("n_nationkey").cast("long")
    robots_tbl = nat.select(
        h.alias("host_hash"),
        F.when(
            h % 2 == 0,
            F.array(
                F.concat(F.lit("https://h"), h.cast("string"), F.lit("/sitemap/0")),
                F.concat(F.lit("https://h"), h.cast("string"), F.lit("/sitemap/1")),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("sitemap_urls"),
    )
    popped = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 < 3).select(
        F.col("c_nationkey").cast("long").alias("host_hash")
    )
    return sitemap_urls_for_hosts(popped, robots_tbl)


@register(
    "robots_refetch_due",
    """
    WITH popped AS (
      SELECT DISTINCT 'h' || CAST(c_nationkey AS VARCHAR) AS host,
             CAST(c_nationkey AS BIGINT) AS host_hash
      FROM customer WHERE c_custkey % 5 < 2
    ),
    rb AS (
      SELECT CAST(s_suppkey AS BIGINT) AS host_hash,
             s_suppkey % 10 AS age
      FROM supplier WHERE s_suppkey <= 20
    )
    SELECT popped.host, popped.host_hash
    FROM popped LEFT JOIN rb USING (host_hash)
    WHERE rb.host_hash IS NULL OR rb.age <= 3
    """,
)
def q_robots_refetch_due(spark, sf_dir):
    """Robots refetch staleness selection: the REAL operators.robots.
    stale_hosts (distinct popped hosts right-joined against the per-host
    robots dim, due when the cached fetched_ts is older than the TTL OR
    the host has no cached row at all). Supplier keys <= 20 stand in as
    the robots cache with fetched_ts = 2024-01-01 + (s_suppkey%10) days;
    customer as the popped batch (c_nationkey 0..24, so keys 0 and 21+
    exercise the missing-row branch). as_of 2024-01-08 with a 4-day TTL
    makes the cutoff 2024-01-04, so the DuckDB oracle states the
    staleness arithmetic in closed form: due iff s_suppkey%10 <= 3 or no
    row. In the loop this feeds scheduler step 1b (refetch + MERGE)."""
    from crawler_spark.operators.robots import stale_hosts

    popped = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 < 2).select(
        F.concat(F.lit("h"), F.col("c_nationkey").cast("string")).alias("host"),
        F.col("c_nationkey").cast("long").alias("host_hash"),
    )
    robots_tbl = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 20).select(
        F.col("s_suppkey").cast("long").alias("host_hash"),
        F.expr(
            "timestamp '2024-01-01 00:00:00'"
            " + make_interval(0, 0, 0, CAST(s_suppkey % 10 AS INT))"
        ).alias("fetched_ts"),
    )
    return stale_hosts(popped, robots_tbl, "2024-01-08 00:00:00", 4 * 86400)
