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
    SELECT o_orderkey,
           max_ts AS asof_ts,
           round(1e-9 + val, 4) AS asof_value
    FROM (
      SELECT o.o_orderkey, e.ts, e.value AS val,
             row_number() OVER (PARTITION BY o.o_orderkey
                                ORDER BY e.ts DESC, e.event_id DESC) AS rn,
             e.ts AS max_ts
      FROM orders o
      JOIN events e ON e.user_id = o.o_custkey % 150 AND e.ts <= o.o_orderdate
      WHERE o.o_orderkey % 100 = 0
    ) WHERE rn = 1
"""


@register("asof_join_latest_event", _ASOF_SQL)
def q_asof_join_latest_event(spark, sf_dir):
    """As-of join: for each order, the latest event at-or-before its
    timestamp for its (bucketed) user — range-condition join then
    rank-1 per left row with a deterministic tiebreak. At scale the
    range join is bounded by bucketing both sides on the key and
    range-partitioning time (Spark also auto-selects a range join when
    hinted); this form is the semantics oracle."""
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", (F.col("o_custkey") % 150).alias("k"), "o_orderdate")
    )
    events = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    j = orders.join(
        events, (events.user_id == orders.k) & (events.ts <= orders.o_orderdate)
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            F.col("ts").alias("asof_ts"),
            F.round(F.col("value") + F.lit(1e-9), 4).alias("asof_value"),
        )
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
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
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
