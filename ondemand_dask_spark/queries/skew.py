"""Skew-mitigation operators as registered queries (SURVEY §4, the
100 TB posture).

AQE's skew-join splitting handles most runtime skew; these are the
EXPLICIT levers (operators/skew.py) for the shapes AQE cannot fix —
a hot grouping key saturating one reducer, a shuffle join whose left
key is pathologically hot.  Salting only re-routes rows, never
changes semantics, so both queries oracle-check against the PLAIN
(unsalted) SQL — the differential test that the mitigation is
invisible in the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.operators.skew import salted_agg, salted_join
from ondemand_dask_spark.registry import register

_R = 4


@register(
    "agg_salted_skew",
    oracle=f"""
    SELECT event_type,
           round(sum(value) - 1e-9, {_R}) + 0.0 AS sum_value,
           count(event_id)                AS n,
           round(min(value) - 1e-9, {_R}) + 0.0 AS min_value,
           round(max(value) - 1e-9, {_R}) + 0.0 AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a low-cardinality (= skew-
    shaped) key: partial groupBy on (key, salt in [0,16)) caps any
    single task at 1/16 of a hot key, final groupBy on (key) combines
    partials.  The oracle is the plain GROUP BY — identical answers
    are the whole point."""
    e = load_table(spark, sf_dir, "events")
    out = salted_agg(
        e,
        ["event_type"],
        {
            "sum_value": ("sum", "value"),
            "n": ("count", "event_id"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
        buckets=16,
        salt_from=["event_id"],
    )
    return out.select(
        "event_type",
        F.round(F.col("sum_value") - 1e-9, _R).alias("sum_value"),
        "n",
        F.round(F.col("min_value") - 1e-9, _R).alias("min_value"),
        F.round(F.col("max_value") - 1e-9, _R).alias("max_value"),
    )


@register(
    "join_salted_skew",
    oracle=f"""
    WITH prof AS (
      SELECT user_id, min(ts) AS first_seen, count(*) AS user_events
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type,
           p.first_seen, p.user_events,
           round(e.value - 1e-9, {_R}) + 0.0 AS value
    FROM events e JOIN prof p ON e.user_id = p.user_id
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: the fact side (events, hot user_ids) gets a
    deterministic salt, the profile side is replicated ×8 with an
    exploded salt, and the join runs on (user_id, salt) — the hot key
    spreads over 8 tasks.  Replication cost = |right|×8, the right
    trade when the right side is small but above the broadcast
    threshold.  Oracle = the plain join."""
    e = load_table(spark, sf_dir, "events")
    prof = e.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"), F.count("*").alias("user_events")
    )
    joined = salted_join(
        e.select("event_id", "user_id", "event_type", "value"),
        prof,
        on="user_id",
        buckets=8,
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        "first_seen",
        "user_events",
        F.round(F.col("value") - 1e-9, _R).alias("value"),
    )
