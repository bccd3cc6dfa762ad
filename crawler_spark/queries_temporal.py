"""Temporal operators beyond the reference: as-of join and gap-based
sessionization — table stakes for training-data pipelines over event
streams, oracle-checked. (The reference's closest shape is the frontier
pop's time ordering, SURVEY §2.3 note: "no as-of joins exist"; Spark
composes them from joins + windows.)"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawler_spark.queries import _t, register

_ASOF_SQL = """
    SELECT event_id,
           asof_orderkey,
           asof_orderdate
    FROM (
      SELECT e.event_id, o.o_orderkey AS asof_orderkey,
             o.o_orderdate AS asof_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey % 150 = e.user_id AND o.o_orderdate <= e.ts
      WHERE e.event_id % 200 = 0
    ) WHERE rn = 1
"""


@register("asof_join_latest_event", _ASOF_SQL)
def q_asof_join_latest_event(spark, sf_dir):
    """As-of join: for each (sampled) event, the latest order placed
    at-or-before the event's timestamp for its (bucketed) customer key —
    range-condition join then rank-1 per left row with a deterministic
    tiebreak. Direction chosen so the range predicate is satisfiable on
    the driver's testdata (orderdates 1992-98 precede the 2024 events),
    making the oracle non-vacuous. At scale the range join is bounded by
    bucketing both sides on the key and range-partitioning time (Spark
    also auto-selects a range join when hinted); this form is the
    semantics oracle."""
    events = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 200 == 0)
        .select("event_id", "user_id", "ts")
    )
    orders = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 150).alias("k"), "o_orderkey", "o_orderdate"
    )
    j = events.join(
        orders, (orders.k == events.user_id) & (orders.o_orderdate <= events.ts)
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            F.col("o_orderkey").alias("asof_orderkey"),
            F.col("o_orderdate").alias("asof_orderdate"),
        )
    )


@register(
    "value_percentiles",
    """
    SELECT event_type,
           round(1e-9 + quantile_cont(value, 0.5), 4) AS p50,
           round(1e-9 + quantile_cont(value, 0.95), 4) AS p95
    FROM events GROUP BY event_type
    """,
)
def q_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per key (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation). The approximate
    scale path is approx_percentile (t-digest/GK) — not oracle-comparable
    across engines, so the exact form is the checked one."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)") + F.lit(1e-9), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)") + F.lit(1e-9), 4).alias("p95"),
        )
    )


_PIVOT_TYPES = ["click", "view", "purchase", "error", "signup"]

@register(
    "pivot_event_counts",
    """
    SELECT user_id % 10 AS user_bucket,
           {cols}
    FROM events GROUP BY user_id % 10
    """.format(cols=", ".join(
        f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}"
        for t in _PIVOT_TYPES
    )),
)
def q_pivot_event_counts(spark, sf_dir):
    """Pivot (long->wide): per-bucket counts of each event type as
    columns. Spark's pivot with an explicit value list stays a single
    hash aggregate (no second shuffle, no value-discovery job)."""
    return (
        _t(spark, sf_dir, "events")
        .withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .select(
            "user_bucket",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _PIVOT_TYPES],
        )
    )


@register(
    "rolling_window_sum",
    """
    SELECT event_id, user_id,
           round(1e-9 + sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW
           ), 4) AS rolling_1d
    FROM events
    """,
)
def q_rolling_window_sum(spark, sf_dir):
    """Time-range rolling aggregate: per-user 1-day trailing sum via a
    RANGE frame over epoch MICROSECONDS — integer on both engines (the
    NTZ->timestamp cast is exact: session tz is pinned UTC).
    (unix_timestamp/epoch() disagree on sub-second timestamps: Spark
    truncates to whole seconds, DuckDB keeps the fraction, so a row
    exactly at the 1-day boundary lands inside one engine's frame and
    outside the other's — surfaced by the sf0.1 sweep.) The
    metrics-smoothing shape for the daily-snapshot tables (SURVEY §2.4
    A5 extension)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-86_400_000_000, 0)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w) + F.lit(1e-9), 4).alias("rolling_1d"),
    )


_SESSION_GAP = 6 * 3600

_SESSION_SQL = f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > {_SESSION_GAP}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
"""


@register("sessionize_events", _SESSION_SQL)
def q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization: a new session starts after a >6h silence
    — lag + running sum of session-start markers, then per-session
    rollup. One shuffle on user_id serves both windows AND the final
    groupBy (same key: Catalyst reuses the partitioning)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > _SESSION_GAP),
            1,
        ).otherwise(0),
    )
    wcum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = marked.withColumn("session_id", F.sum("new_session").over(wcum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
