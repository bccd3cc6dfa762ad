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
