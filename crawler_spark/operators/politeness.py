"""Per-host politeness tokens (ref: the API-key quota system).

The reference rotates API keys by least-use and resets usage when the
Pacific calendar day rolls (src/repos/apikeys_repo.rs:25-67,
src/models/apikey.rs:4-10). Generalized per north_rule to per-HOST
token budgets: a tiny table (one row per host — even 10^8 hosts is
GBs, not TBs) that (a) caps each pop via a broadcast join and (b) is
MERGE-updated with the batch's actual fetch counts using the same
inc-or-reset day-roll CASE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pacific_day(as_of_ts) -> F.Column:
    """yyyymmdd in America/Los_Angeles (ref apikeys_repo.rs:40-45)."""
    return F.date_format(
        F.from_utc_timestamp(F.lit(as_of_ts).cast("timestamp"), "America/Los_Angeles"),
        "yyyyMMdd",
    ).cast("int")


def remaining_budget(politeness: DataFrame, as_of_ts, tick_secs: int | None = None) -> DataFrame:
    """(host_hash, budget) — tokens left today per host. A day roll means
    the full daily quota is available regardless of stored used_quota.

    With `tick_secs`, the budget is additionally capped by the per-host
    min-delay rate: at most floor(tick_secs*1000 / min_delay_ms) fetches
    fit in one batch window without violating the inter-request delay —
    the per-host politeness interval the reference approximates with its
    fixed crawl cadences (SURVEY §2.9 T1)."""
    today = pacific_day(as_of_ts)
    rolled = F.col("quota_day") < today
    quota_left = (
        F.when(rolled, F.col("daily_quota"))
        .otherwise(F.greatest(F.col("daily_quota") - F.col("used_quota"), F.lit(0)))
    )
    if tick_secs is not None:
        rate_cap = F.floor(F.lit(tick_secs * 1000) / F.greatest("min_delay_ms", F.lit(1)))
        quota_left = F.least(quota_left, rate_cap)
    return politeness.select("host_hash", quota_left.cast("int").alias("budget"))


def apply_crawl_delay(politeness: DataFrame, robots: DataFrame) -> DataFrame:
    """Fold the robots Crawl-delay directive into the ledger view used
    at pop time: the effective inter-request delay per host is the
    STRICTER of the ledger's min_delay_ms and the host's directive.
    Read-side only — the politeness TABLE keeps its own min_delay_ms,
    so a changed robots fetch takes effect on the next pop without a
    ledger rewrite. Broadcast join: both sides are per-HOST dims, so
    this never touches the frontier's row count; at extreme host
    cardinality (10^8 hosts ~ GBs) drop the hint and let AQE choose,
    same as remaining_budget's note — the ledger and robots shuffle
    host_hash-to-host_hash, still O(hosts) not O(frontier)."""
    cd = robots.select("host_hash", "crawl_delay_ms")
    return (
        politeness.join(F.broadcast(cd), "host_hash", "left")
        .withColumn(
            "min_delay_ms",
            F.greatest(
                "min_delay_ms", F.coalesce("crawl_delay_ms", F.lit(0))
            ).cast("int"),
        )
        .drop("crawl_delay_ms")
    )


def charge(politeness: DataFrame, fetch_counts: DataFrame, as_of_ts) -> DataFrame:
    """MERGE the batch's per-host fetch counts into the token table with
    inc-or-reset semantics (ref apikeys_repo.rs:46-59; kernel parity:
    kernels.quota_roll). `fetch_counts` is (host_hash, n)."""
    today = pacific_day(as_of_ts)
    joined = politeness.join(fetch_counts, "host_hash", "left").withColumn(
        "__n", F.coalesce(F.col("n"), F.lit(0))
    )
    rolled = (F.col("quota_day") < today) & (F.col("__n") > 0)
    return joined.select(
        "host_hash",
        F.when(rolled, F.col("__n"))
        .otherwise(F.col("used_quota") + F.col("__n"))
        .cast("int")
        .alias("used_quota"),
        "daily_quota",
        F.when(rolled, today).otherwise(F.col("quota_day")).cast("int").alias("quota_day"),
        "min_delay_ms",
    )
