"""Frontier: partitioned priority-queue over a snapshot table.

The reference pops its recrawl frontier with a store-side
filter+sort+limit (src/repos/channel_repo.rs:74-108: `lastCrawl < now-1d
AND lastUploadAt >= now-52w`, sort lastCrawl asc, limit 100) and its seed
frontier destructively (read -> enqueue -> delete,
src/crawler/additional_channel_crawler.rs:31-48). Both collapse into one
operator here: **rank-and-take per host** with a total deterministic
order, politeness-capped, executed as a window over the ready partition
of the frontier table.

Determinism (the pop-order parity contract, SURVEY §7 "hard parts"): the
pop order is the total order (priority asc, next_fetch_ts asc, url_hash
asc). Per-host ranking plus a global sort on the same key produce exactly
the order a single-threaded reference implementation yields, regardless
of parallelism.

Scale: the window shuffles only the READY slice (next_fetch_ts <= as_of
prunes at the scan — partition frontier storage by day(next_fetch_ts) on
a real deployment and file pruning makes the ready slice cheap even at
10^10 rows). Hot hosts cost nothing extra: row_number caps each host at
k, so skew is bounded by construction; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

POP_ORDER = ("priority", "next_fetch_ts", "url_hash")

# Adaptive pop caps scale with the DECADE of a host's ready-queue depth
# (the same integer digits(n) bucketing host_depth_histogram reports):
# cap = k_per_host * digits(depth). A positive int64 has at most 19
# digits, so k * 19 is the literal upper bound the window pre-filter can
# use while still triggering Catalyst's InferWindowGroupLimit.
ADAPTIVE_MAX_DIGITS = 19

# pop-priority classes (lower pops first): seeds, then fresh discoveries,
# then recrawls — the three reference producers (src/main.rs:87-106)
PRIORITY_SEED = 0
PRIORITY_DISCOVERY = 1
PRIORITY_UPDATE = 2


def ready(frontier: DataFrame, as_of_ts) -> DataFrame:
    """Rows eligible to fetch now (predicate reaches the parquet scan)."""
    return frontier.filter(F.col("next_fetch_ts") <= F.lit(as_of_ts).cast("timestamp"))


def pop(
    frontier: DataFrame,
    as_of_ts,
    k_per_host: int,
    host_budget: DataFrame | None = None,
    global_k: int | None = None,
    adaptive: bool = False,
    boost_hosts: DataFrame | None = None,
    boost_factor: int = 2,
) -> DataFrame:
    """Pop the next batch: per-host rank by (priority, next_fetch_ts,
    url_hash) and take at most min(cap, host's remaining politeness
    budget); optionally cap the whole batch at global_k by the same total
    order.

    `host_budget` is (host_hash, budget int) — the politeness allowance
    computed by operators.politeness.remaining_budget; it is small (one
    row per host) and broadcast. At extreme host cardinality (10^8 hosts
    ~ GBs) drop the explicit broadcast hint and let AQE choose: the ready
    slice is already shuffled by host_hash for the window, so a shuffled
    hash join adds no extra exchange on the big side.

    `adaptive=True` feeds host_depth_histogram's skew signal back into
    the pop: cap = k_per_host * digits(host's ready depth) — a host with
    10^d queued URLs drains d+1 times faster than a shallow one, so deep
    queues shrink logarithmically instead of starving behind a flat cap,
    while the politeness budget still bounds every host (the cap NEVER
    exceeds the quota/min-delay allowance). Depth is a map-side-combined
    (host, count) aggregate over the same ready slice — one tiny extra
    shuffle, broadcast back like the budget. Mirrored EXACTLY in
    simulator._pop (pop-order parity contract).

    `boost_hosts` is a (host_hash) set of link-authority hosts (the
    scheduler passes the top decile of the loop-maintained host_ranks):
    their base/adaptive cap is multiplied by `boost_factor` — high-
    authority hosts drain faster, the crawl-prioritization signal the
    host PageRank exists for. The politeness budget STILL bounds the
    boosted cap. Mirrored exactly in simulator._pop.
    """
    r = ready(frontier, as_of_ts)
    w = Window.partitionBy("host_hash").orderBy(
        F.col("priority").asc(), F.col("next_fetch_ts").asc(), F.col("url_hash").asc()
    )
    # Filter by a LITERAL first: Catalyst's InferWindowGroupLimit only
    # fires on `rank <= literal`, inserting map-side per-group top-k
    # pruning BEFORE the window shuffle (the window analogue of partial
    # aggregation) — without it every ready row is shuffled and sorted.
    # The per-host caps (columns, always <= the literal) are applied after.
    lit_cap = k_per_host * (ADAPTIVE_MAX_DIGITS if adaptive else 1) * (
        boost_factor if boost_hosts is not None else 1
    )
    ranked = r.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= F.lit(lit_cap)
    )
    cap = F.lit(k_per_host)
    if adaptive:
        depth = r.groupBy("host_hash").agg(F.count(F.lit(1)).alias("__depth"))
        ranked = ranked.join(F.broadcast(depth), "host_hash")
        cap = F.lit(k_per_host) * F.length(F.col("__depth").cast("string"))
    if boost_hosts is not None:
        bset = boost_hosts.select("host_hash").withColumn("__boost", F.lit(True))
        ranked = ranked.join(F.broadcast(bset), "host_hash", "left")
        cap = cap * F.when(F.col("__boost"), F.lit(boost_factor)).otherwise(F.lit(1))
    if host_budget is not None:
        ranked = ranked.join(F.broadcast(host_budget), "host_hash", "left")
        cap = F.least(cap, F.coalesce(F.col("budget"), F.lit(0)))
    popped = ranked.filter(F.col("__rn") <= cap).drop(
        "__rn", "budget", "__depth", "__boost"
    )
    if global_k is not None:
        popped = popped.orderBy(*[F.col(c).asc() for c in POP_ORDER]).limit(global_k)
    return popped


def fetch_update_rows(
    popped: DataFrame,
    fetched: DataFrame,
    as_of_ts,
    error_retry_secs: int = 6 * 3600,
) -> DataFrame:
    """The REPLACEMENT frontier rows for this batch's popped URLs (the
    upsert side of the frontier MERGE): last_fetch_ts = as_of and
    next_fetch_ts advanced by the staleness policy (success) or an error
    backoff, priority/source flipped to 'update'. Batch-sized — the
    copy-on-write commit path rewrites only the buckets these keys hash
    into, never the whole frontier.

    `popped` carries full frontier rows (pop's output); `fetched` carries
    url_hash, ok:boolean, refresh_secs:long
    (kernels.staleness_threshold_secs)."""
    as_of = F.lit(as_of_ts).cast("timestamp")
    upd = fetched.select(
        "url_hash",
        F.when(
            F.col("ok"),
            as_of + F.make_dt_interval(secs=F.col("refresh_secs").cast("double")),
        )
        .otherwise(as_of + F.make_dt_interval(secs=F.lit(float(error_retry_secs))))
        .alias("__next_fetch_ts"),
    )
    return popped.join(upd, "url_hash").select(
        "url",
        "url_hash",
        "host",
        "host_hash",
        # once fetched, a row becomes an 'update' (recrawl) row
        F.lit(PRIORITY_UPDATE).cast("int").alias("priority"),
        F.col("__next_fetch_ts").alias("next_fetch_ts"),
        as_of.alias("last_fetch_ts"),
        F.lit("update").alias("source"),
        "ignore_filter_terms",
        "depth",
    )


def after_fetch(
    frontier: DataFrame,
    fetched: DataFrame,
    as_of_ts,
    error_retry_secs: int = 6 * 3600,
) -> DataFrame:
    """Write-back of pop visibility (SURVEY §3.2) as a whole-table
    transform: MERGE fetch_update_rows into the frontier. The scheduler
    uses the bucket-level plan_merge path instead; this form remains for
    callers that want the full post-merge table in one expression. The
    next pop sees the updated state, exactly like the reference where
    re-selection is prevented only by the scrape's lastCrawl update
    (src/scraper/channel_scraper.rs:100)."""
    from crawler_spark.tables import merge_upsert

    popped = frontier.join(fetched.select("url_hash"), "url_hash", "left_semi")
    return merge_upsert(
        frontier, fetch_update_rows(popped, fetched, as_of_ts, error_retry_secs), "url_hash"
    )


def insert_discovered(frontier: DataFrame, discovered: DataFrame) -> DataFrame:
    """Add newly admitted URLs (already deduped vs seen) to the frontier.
    Anti-join guards against same-batch duplicates racing in."""
    new_rows = discovered.select(*frontier.columns).join(
        frontier.select("url_hash"), "url_hash", "left_anti"
    )
    return frontier.unionByName(new_rows)
