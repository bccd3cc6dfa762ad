"""Robots.txt enforcement, set-wise (north_rule; generalizes the
reference's hard deny-list, src/repos/blacklist_repo.rs:20-35).

Rules live in the `robots` table (host_hash -> array<struct<allow,
path_prefix>>), cached with a fetched_ts TTL like the reference caches
its blacklist in memory for the process lifetime (src/main.rs:162-164).
Verdict = longest matching path-prefix wins; hosts with no rules default
to allowed.

Plan shape: broadcast join (robots is per-host, small relative to any
URL batch) + explode + one window-free aggregation via max_by(struct) —
a single shuffle on url_hash, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_allowed(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Keep candidates whose path is allowed by their host's rules.

    `candidates` must carry url + host_hash; all columns pass through.
    """
    path = F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("/"))
    with_rules = candidates.withColumn("__path", path).join(
        F.broadcast(robots.select("host_hash", "rules")), "host_hash", "left"
    )
    matched = with_rules.select(
        *candidates.columns,
        "__path",
        F.explode_outer("rules").alias("__rule"),
    ).withColumn(
        "__hit",
        F.col("__rule").isNotNull()
        & F.col("__path").startswith(F.col("__rule.path_prefix")),
    )
    # longest matching prefix wins; no rule rows at all -> allowed
    verdict = (
        matched.groupBy("url_hash")
        .agg(
            F.max_by(
                F.when(F.col("__hit"), F.col("__rule.allow")).otherwise(F.lit(True)),
                F.when(F.col("__hit"), F.length("__rule.path_prefix")).otherwise(F.lit(-1)),
            ).alias("__allowed")
        )
        .filter(F.col("__allowed"))
        .select("url_hash")
    )
    return candidates.join(verdict, "url_hash", "left_semi")


def stale_hosts(
    popped: DataFrame, robots: DataFrame, as_of_ts, ttl_secs: int
) -> DataFrame:
    """(host, host_hash) of the batch's popped hosts whose cached robots
    row is stale (fetched_ts older than the TTL) or missing — the refetch
    set, mirroring the reference's process-lifetime cache going cold
    (src/main.rs:162-164 re-reads dims at startup; a long-lived crawler
    must re-read on a cadence instead). Distinct popped hosts are O(pop
    cap). Spark cannot broadcast the PRESERVED side of an outer join, so
    the tiny host set is broadcast twice on the BUILD side instead: a
    broadcast left-semi prunes the per-host robots dim to the popped
    hosts (a parallel scan probe, no shuffle of the dim), then that
    pop-sized slice broadcasts under the left outer that surfaces
    missing rows as nulls."""
    cutoff = F.lit(as_of_ts).cast("timestamp") - F.expr(
        f"INTERVAL {int(ttl_secs)} SECOND"
    )
    hosts = popped.select("host", "host_hash").distinct()
    robots_slice = robots.select("host_hash", "fetched_ts").join(
        F.broadcast(hosts.select("host_hash")), "host_hash", "left_semi"
    )
    return (
        hosts.join(F.broadcast(robots_slice), "host_hash", "left")
        .filter(F.col("fetched_ts").isNull() | (F.col("fetched_ts") <= cutoff))
        .select("host", "host_hash")
    )


def fold_refetch(robots: DataFrame, refreshed: DataFrame) -> DataFrame:
    """Fold freshly fetched robots rows over the cached table: refreshed
    hosts replace their old row, everything else carries through. The
    robots table is a per-host dim (O(hosts) rows — politeness.py's
    sizing note applies), so a full-rewrite fold matches the politeness
    charge; the read-side delay/sitemap folds bind the new content on
    the NEXT pop with zero further I/O."""
    keep = robots.join(refreshed.select("host_hash"), "host_hash", "left_anti")
    return keep.unionByName(refreshed.select(*robots.columns))


def sitemap_urls_for_hosts(popped: DataFrame, robots: DataFrame) -> DataFrame:
    """Sitemap directives as a discovery source: the batch's popped
    hosts surface their robots Sitemap URLs as depth-1 candidates
    (raw_url, depth) — merged into the outlink stream BEFORE
    canonicalization and the min-depth-per-URL agg, so a URL reachable
    both ways keeps one candidate row. The seen negative/positive cache
    makes the injection once-only; re-popping a host re-offers its
    sitemap, which the seen anti-join drops for free. Semi-join against
    the (tiny, distinct) popped host set keeps this a broadcast probe
    of the per-host robots dim."""
    hosts = popped.select("host_hash").distinct()
    return (
        robots.join(F.broadcast(hosts), "host_hash", "left_semi")
        .select(F.explode("sitemap_urls").alias("raw_url"))
        .withColumn("depth", F.lit(1).cast("int"))
    )
