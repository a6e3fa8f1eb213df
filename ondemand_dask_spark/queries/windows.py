"""§2.E / §2.F — window functions, sorts, top-k.

Dask implements rolling/shift via `map_overlap` (ghost rows copied
across partition boundaries) and cumulatives via post-set_index
graphs; Spark's `Window` covers all of it natively, executing as a
single shuffle on the partition key followed by a per-partition sort
— no ghost-row machinery, and the same plan scales to 100 TB as long
as individual partition keys fit in an executor (events are keyed by
user_id here; a global window with no partitionBy collapses to one
task and is flagged in the one query that needs it).

Determinism: every orderBy includes a unique tiebreaker column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.operators.checkpoint import RetainedCaches
from ondemand_dask_spark.registry import register

_R = 4

# Checkpoint lifecycle for the two-phase global rank's pinned range
# exchange (sort_global_rank_scalable): retained past the call,
# released at the next entry — same discipline as dedup/graph.
_CACHES = RetainedCaches()


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "window_lag_lead",
    oracle=f"""
    SELECT event_id, user_id,
           round((lag(value)  OVER w) - 1e-9, {_R}) + 0.0 AS prev_value,
           round((lead(value) OVER w) - 1e-9, {_R}) + 0.0 AS next_value,
           round((value - lag(value) OVER w) - 1e-9, {_R}) + 0.0 AS diff_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.shift(k) / diff() — lag/lead over an ordered per-key window."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value")
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round((F.lag(v).over(w)) - 1e-9, _R).alias("prev_value"),
        F.round((F.lead(v).over(w)) - 1e-9, _R).alias("next_value"),
        F.round((v - F.lag(v).over(w)) - 1e-9, _R).alias("diff_value"),
    )


@register(
    "window_cumsum",
    oracle=f"""
    SELECT event_id, user_id,
           round((sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - 1e-9, {_R}) + 0.0
             AS running_total,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
    FROM events
    """,
)
def window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.cumsum / groupby.cumcount — running totals per key."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round((F.sum("value").over(w)) - 1e-9, _R).alias("running_total"),
        F.count("*").over(w).alias("cum_n"),
    )


@register(
    "window_cummax_cummin",
    oracle=f"""
    SELECT event_id, user_id,
           round((max(value) OVER w) - 1e-9, {_R}) + 0.0 AS cum_max,
           round((min(value) OVER w) - 1e-9, {_R}) + 0.0 AS cum_min
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_cummax_cummin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.cummax / cummin."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round((F.max("value").over(w)) - 1e-9, _R).alias("cum_max"),
        F.round((F.min("value").over(w)) - 1e-9, _R).alias("cum_min"),
    )


@register(
    "window_cumprod",
    oracle=f"""
    SELECT event_id, user_id,
           round((exp(sum(ln(1 + value / 1000)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) - 1e-9, {_R}) + 0.0 AS cum_growth
    FROM events
    """,
)
def window_cumprod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.cumprod — exp∘cumsum∘ln on both engines (identical
    numerics, stays in codegen).  Ordered by (ts, event_id): the
    unique tiebreaker is required — lineitem's (orderkey, linenumber)
    is NOT unique in these fixtures (11k dup pairs at sf0.01)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round((F.exp(F.sum(F.log(F.lit(1) + F.col("value") / 1000)).over(w))) - 1e-9, _R
        ).alias("cum_growth"),
    )


@register(
    "window_rolling_rows",
    oracle=f"""
    SELECT event_id, user_id,
           round((avg(value) OVER w) - 1e-9, {_R}) + 0.0 AS ma3,
           round((sum(value) OVER w) - 1e-9, {_R}) + 0.0 AS sum3,
           count(*) OVER w AS n3,
           round((min(value) OVER w) - 1e-9, {_R}) + 0.0 AS min3,
           round((max(value) OVER w) - 1e-9, {_R}) + 0.0 AS max3,
           CASE WHEN count(*) OVER w > 1
                THEN round((stddev_samp(value) OVER w) - 1e-9, {_R}) + 0.0
           END AS sd3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.rolling(3).mean/sum/count/min/max/std — fixed row-count
    sliding frame (std guarded to n>1: single-row samples are NULL on
    both engines by construction, not engine-dependent NaN)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round((F.avg("value").over(w)) - 1e-9, _R).alias("ma3"),
        F.round((F.sum("value").over(w)) - 1e-9, _R).alias("sum3"),
        F.count("*").over(w).alias("n3"),
        F.round((F.min("value").over(w)) - 1e-9, _R).alias("min3"),
        F.round((F.max("value").over(w)) - 1e-9, _R).alias("max3"),
        F.when(
            F.count("*").over(w) > 1,
            F.round((F.stddev_samp("value").over(w)) - 1e-9, _R),
        ).alias("sd3"),
    )


@register(
    "window_rolling_time",
    oracle=f"""
    SELECT event_id, user_id,
           round((sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)) - 1e-9, {_R}) + 0.0 AS sum_1h
    FROM events
    """,
)
def window_rolling_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.rolling('1h', on=ts) — time-based sliding frame: RANGE over
    epoch microseconds (identical frame boundaries on both engines)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round((F.sum("value").over(w)) - 1e-9, _R).alias("sum_1h"),
    )


@register(
    "window_expanding",
    oracle=f"""
    SELECT event_id, user_id,
           round((avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - 1e-9, {_R}) + 0.0
             AS expanding_mean
    FROM events
    """,
)
def window_expanding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.expanding().mean() — unbounded-preceding frame."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round((F.avg("value").over(w)) - 1e-9, _R).alias("expanding_mean"),
    )


@register(
    "window_rank_family",
    oracle="""
    SELECT o_orderkey,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           row_number()   OVER w AS rn,
           round((percent_rank() OVER w) - 1e-9, 4) + 0.0 AS prnk,
           ntile(4)       OVER w AS quartile,
           round((cume_dist() OVER w) - 1e-9, 4) + 0.0 AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.rank(method=...) / groupby.rank — the full ranking family."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.round((F.percent_rank().over(w)) - 1e-9, 4).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round((F.cume_dist().over(w)) - 1e-9, 4).alias("cdist"),
    )


@register(
    "window_transform_broadcast",
    oracle=f"""
    SELECT c_custkey,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey)) - 1e-9, {_R}) + 0.0
             AS bal_vs_nation
    FROM customer
    """,
)
def window_transform_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby(k).transform(f) — per-group aggregate broadcast back to
    rows: an unordered partition window (one shuffle, no join)."""
    w = Window.partitionBy("c_nationkey")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round((F.col("c_acctbal") - F.avg("c_acctbal").over(w)) - 1e-9, _R).alias(
            "bal_vs_nation"
        ),
    )


@register(
    "resample_day",
    oracle=f"""
    SELECT date_trunc('day', ts) AS day,
           round((sum(value)) - 1e-9, {_R}) + 0.0 AS daily_value,
           count(*) AS n_events
    FROM events GROUP BY date_trunc('day', ts)
    """,
)
def resample_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.resample('1D', on=ts).agg — time-bucket aggregation via
    date_trunc (plain groupBy: scales as an ordinary hash agg)."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day"))
        .agg(
            F.round((F.sum("value")) - 1e-9, _R).alias("daily_value"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "resample_hour_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL 6 HOURS, ts) AS bucket_start,
           round((avg(value)) - 1e-9, {_R}) + 0.0 AS avg_value
    FROM events GROUP BY 1
    """,
)
def resample_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resample('6h') via F.window — tumbling bucket, returns the
    bucket start to match DuckDB's time_bucket."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.window(F.col("ts"), "6 hours").alias("w"))
        .agg(F.round((F.avg("value")) - 1e-9, _R).alias("avg_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("bucket_start"), "avg_value"
        )
    )


@register(
    "sort_values_global",
    oracle="""
    SELECT event_id, row_number() OVER (ORDER BY ts, event_id) AS pos
    FROM events
    """,
)
def sort_values_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.sort_values(by) — global total order.  Spark's orderBy
    range-partitions by sampled boundaries exactly like Dask's
    set_index; emitting the global position materializes the order so
    the hash actually checks it.  (The position column forces a
    single-partition window — fine for verification, not a pattern
    for 100 TB; orderBy itself stays distributed.)"""
    w = Window.orderBy("ts", "event_id")
    return _events(spark, sf_dir).select(
        "event_id", F.row_number().over(w).alias("pos")
    )


@register(
    "topk_nlargest",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def topk_nlargest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.nlargest(k, col) — orderBy+limit plans as
    TakeOrderedAndProject: per-partition top-k then k-way merge, the
    same algorithm Dask uses, no global sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


@register(
    "topk_nsmallest",
    oracle="""
    SELECT s_suppkey, s_acctbal
    FROM supplier ORDER BY s_acctbal ASC, s_suppkey LIMIT 5
    """,
)
def topk_nsmallest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.nsmallest(k, col)."""
    return (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_acctbal")
        .orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
        .limit(5)
    )


@register(
    "window_nth_first_last",
    oracle=f"""
    SELECT event_id, user_id,
           round(first_value(value) OVER w - 1e-9, {_R}) + 0.0 AS first_v,
           round(nth_value(value, 3) OVER w - 1e-9, {_R}) + 0.0 AS third_v,
           round(last_value(value) OVER w - 1e-9, {_R}) + 0.0 AS last_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_nth_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby.nth / first / last as window transforms — broadcast a
    positional pick back to every row.  The frame is pinned to the
    FULL partition explicitly: both engines default last_value to the
    growing frame (…AND CURRENT ROW), which silently returns the
    current row instead of the partition's last."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    v = F.col("value")
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        (F.round(F.first_value(v).over(w) - 1e-9, _R) + F.lit(0.0)).alias("first_v"),
        (F.round(F.nth_value(v, 3).over(w) - 1e-9, _R) + F.lit(0.0)).alias("third_v"),
        (F.round(F.last_value(v).over(w) - 1e-9, _R) + F.lit(0.0)).alias("last_v"),
    )


_EWM_ALPHA = 0.3
_EWM_L = 32  # lookback: (1-a)^32 ≈ 1e-5 — below the 4-dp round
_EWM_W = [(1.0 - _EWM_ALPHA) ** i for i in range(_EWM_L - 1, -1, -1)]
_EWM_W_SQL = "CAST([" + ", ".join(repr(x) for x in _EWM_W) + "] AS DOUBLE[])"


@register(
    "window_ewm_bounded",
    twin="udf_ewm",  # the exact-recursion certificate
    oracle=f"""
    WITH fr AS (
      SELECT event_id, user_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN {_EWM_L - 1} PRECEDING AND CURRENT ROW)
               AS chunk
      FROM events
    )
    SELECT event_id, user_id,
           round(
             list_dot_product(chunk,
                              ({_EWM_W_SQL})[{_EWM_L} - len(chunk) + 1 : {_EWM_L}])
             / ((1 - pow({1.0 - _EWM_ALPHA}, len(chunk))) / {_EWM_ALPHA})
             - 1e-9, {_R}) + 0.0 AS ewm_value
    FROM fr
    """,
)
def window_ewm_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.ewm(alpha).mean() with a bounded lookback — the
    ORACLE-CHECKED sibling of `udf_ewm`: truncating the recursion at
    L=32 terms (weight (1-a)^32 ≈ 1e-5, below the rounding grid)
    turns the sequential recurrence into a 32-term weighted lag sum
    over one ordered window — no Python, no cross-row state, same
    single user_id-shuffle as every other window here, so it scales
    like rolling-mean instead of like a stateful scan.  All 32 lags
    share one window sort; measured at 5M rows this runs 3.5× faster
    than the equivalent collect_list frame + dot product (10.5s vs
    37s — the array materialization, not the math, was the cost).
    The denominator is the closed-form geometric sum over however
    many rows precede (exact for the first L-1 rows of each key)."""
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    # newest row weighs (1-a)^0; lag(i) pulls progressively older rows
    for i, wt in enumerate(reversed(_EWM_W)):
        term = F.coalesce(F.lag("value", i).over(wo) * F.lit(wt), F.lit(0.0))
        num = term if num is None else num + term
    n = F.least(F.row_number().over(wo), F.lit(_EWM_L))
    den = (F.lit(1.0) - F.pow(F.lit(1.0 - _EWM_ALPHA), n)) / F.lit(_EWM_ALPHA)
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round(num / den - 1e-9, _R).alias("ewm_value"),
    )


@register(
    "window_rolling_median",
    oracle=f"""
    SELECT event_id, user_id,
           round(median(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                 - 1e-9, {_R}) + 0.0 AS med5
    FROM events
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.rolling(5).median() — the one rolling agg Spark's window
    aggregates don't cover (no ordered-statistic window over a row
    frame).  The frame is BOUNDED (5 rows), so sorting a collected
    frame array per row is O(k log k) constant work — legitimate
    here, unlike the unbounded collect shapes the quantile operator
    exists to avoid.  Interpolation matches quantile_cont: mean of
    the two middle elements on even frames (the first 4 rows of each
    key)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = (lo + hi) / 2.0
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round(med - 1e-9, _R).alias("med5"),
    )


@register(
    "window_fill_forward",
    oracle=f"""
    WITH gappy AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1e-9, {_R})
             + 0.0 AS ffilled,
           round(first_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) - 1e-9, {_R})
             + 0.0 AS bfilled
    FROM gappy
    """,
)
def window_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.ffill() / bfill() — gap filling by carrying the last (next)
    observation over an ordered per-key window, the time-series
    repair step (a fifth of the values are NULLed deterministically
    first).  `last(ignorenulls)` over the expanding frame IS the
    carry-forward scan, distributed: one user_id shuffle, both
    directions computed in the same sort (Catalyst flips the frame,
    not the data).  The same primitive the as-of join composition is
    built on (operators/asof.py)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value"))
    g = _events(spark, sf_dir).select("event_id", "user_id", "ts", v.alias("v"))
    return g.select(
        "event_id",
        "user_id",
        F.round(
            F.last("v", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            - 1e-9,
            _R,
        ).alias("ffilled"),
        F.round(
            F.first("v", ignorenulls=True).over(
                w.rowsBetween(0, Window.unboundedFollowing)
            )
            - 1e-9,
            _R,
        ).alias("bfilled"),
    )


@register(
    "window_pct_change",
    oracle=f"""
    SELECT event_id, user_id,
           round((value / nullif(lag(value) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id), 0) - 1)
                 - 1e-9, {_R}) + 0.0 AS pct_change
    FROM events
    WHERE value IS NOT NULL
    """,
)
def window_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.pct_change() — relative step change against the previous
    observation per key (first row NULL).  One lag over the shared
    user window.  A previous value of exactly 0 yields NULL (nullif
    guard on BOTH engines): under Spark's default ANSI mode a bare
    division would raise DIVIDE_BY_ZERO — found by the full sf0.1
    differential drive, where zero-valued events first appear."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.round(
                F.col("value") / F.nullif(F.lag("value").over(w), F.lit(0))
                - 1
                - 1e-9,
                _R,
            ).alias("pct_change"),
        )
    )


@register(
    "window_distinct_expanding",
    oracle="""
    SELECT event_id, user_id,
           count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS types_seen
    FROM events
    """,
)
def window_distinct_expanding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding distinct count per key (how many event types has
    this user touched so far) — Spark has no COUNT(DISTINCT) OVER, so
    the set itself is the window state: size(collect_set(...)) over
    the expanding frame.  Legitimate because the domain is bounded
    (event types), the same reason a per-key HLL sketch would replace
    it for unbounded domains (agg_hll_sketch_merge is that scale
    path)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("long").alias(
            "types_seen"
        ),
    )


@register(
    "resample_asfreq_gapfill",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             sum(value) AS v, count(*) AS n
      FROM events GROUP BY 1, 2
    ), spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
                                         CAST(mx AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT user_id, min(day) AS mn, max(day) AS mx
            FROM daily GROUP BY user_id)
    )
    SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
           round(last_value(d.v IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1e-9, {_R})
             + 0.0 AS v_ffill
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def resample_asfreq_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.resample('1D').asfreq() + ffill — upsample to a dense daily
    spine per key and carry the last observation across the gaps (the
    other half of resampling: `resample_day` downsamples, this one
    fills the missing buckets in).  The spine is GENERATED, not read:
    per-user min/max day (a tiny agg) exploded through `sequence()`,
    then left-joined back to the observed daily aggregates and
    forward-filled with `last(ignorenulls)`.  Scale shape: the dense
    spine is #users x #days rows — far smaller than the event corpus
    — and the join + window both partition by user_id, so one
    shuffle of the small side; the corpus is touched once by the
    daily pre-aggregation (map-side partials)."""
    daily = (
        _events(spark, sf_dir)
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("v"), F.count("*").alias("n"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))).alias("d"),
        )
        .select("user_id", F.col("d").cast("date").alias("day"))
    )
    g = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return g.select(
        "user_id",
        F.col("day").cast("timestamp_ntz").alias("day"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.round(F.last("v", ignorenulls=True).over(w) - 1e-9, _R).alias("v_ffill"),
    )


@register(
    "window_rolling_corr",
    oracle=f"""
    SELECT event_id, user_id,
           round((covar_samp(value, m) OVER w
                  / NULLIF(stddev_samp(value) OVER w
                           * stddev_samp(m) OVER w, 0)) - 1e-9, {_R})
             + 0.0 AS roll_corr
    FROM (SELECT event_id, user_id, ts, value,
                 CAST(event_id % 97 AS DOUBLE) AS m
          FROM events WHERE value IS NOT NULL)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.rolling(20).corr(other) — rolling correlation between two
    aligned series per key (here: value vs a deterministic companion
    series), the co-movement diagnostic.  Algebraic aggregates inside
    an ordinary window frame — one user_id shuffle, no per-frame
    recomputation.  Built as covar/(sd*sd) EXPLICITLY on both engines
    rather than corr(): the native corr divides by zero on
    single-point / zero-variance frames (an ANSI-mode runtime error
    on a plain Spark 4 session, engine-dependent NaN-vs-NULL
    otherwise); try_divide/NULLIF pins those frames to SQL NULL
    identically (SURVEY §7 hard-part 1)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    m = (F.col("event_id") % 97).cast("double")
    c = F.try_divide(
        F.covar_samp(F.col("value"), m).over(w),
        F.stddev_samp("value").over(w) * F.stddev_samp(m).over(w),
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(c - 1e-9, _R).alias("roll_corr"),
    )


@register(
    "window_zscore_anomaly",
    oracle=f"""
    SELECT event_id, user_id,
           round(((value - avg(value) OVER w)
                  / NULLIF(stddev_samp(value) OVER w, 0)) - 1e-9, {_R})
             + 0.0 AS zscore,
           (abs(round(((value - avg(value) OVER w)
                / NULLIF(stddev_samp(value) OVER w, 0)) - 1e-9, {_R}) + 0.0)
              > 2.0) AS is_anomaly
    FROM events
    WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)
    """,
)
def window_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly flag — each value scored against the
    PRECEDING 19 observations only (frame ends at 1 PRECEDING: the
    current point never contaminates its own baseline, the standard
    leak-free monitoring setup).  One user_id shuffle; mean and std
    share the frame.  Degenerate baselines (one point, zero
    variance) are NULL via try_divide/NULLIF on both engines, never
    a divide-by-zero or NaN."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, -1)
    )
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    z = F.try_divide(
        F.col("value") - F.avg("value").over(w),
        F.stddev_samp("value").over(w),
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(z - 1e-9, _R).alias("zscore"),
        # threshold on the ROUNDED z: a raw |z| one ulp either side
        # of 2.0 across engines would flip the boolean (the cusum
        # alarm lesson, applied proactively)
        (F.abs(F.round(z - 1e-9, _R)) > 2.0).alias("is_anomaly"),
    )


@register(
    "window_interpolate_linear",
    oracle=f"""
    WITH gappy AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events
    ),
    idx AS (
      SELECT event_id, user_id, v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS i
      FROM gappy
    ),
    m AS (
      SELECT event_id, user_id, v, i,
        last_value(v IGNORE NULLS) OVER wp AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS)
          OVER wp AS pi,
        first_value(v IGNORE NULLS) OVER wn AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS)
          OVER wn AS ni
      FROM idx
      WINDOW wp AS (PARTITION BY user_id ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           round(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                      THEN pv + (nv - pv) * (i - pi) / (ni - pi)
                 END - 1e-9, {_R}) + 0.0 AS interpolated
    FROM m
    """,
)
def window_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.interpolate('linear') — interior NULL runs are replaced by
    the straight line between their nearest non-null neighbors
    (position-weighted, so a 3-gap fills 1/4, 2/4, 3/4 of the way);
    leading/trailing NULLs stay NULL, matching pandas' interior-only
    contract.  Built from the same carry primitives as ffill/bfill —
    last/first(ignorenulls) over mirrored expanding frames carry the
    neighbor VALUE and its POSITION, then one codegen'd lerp — and
    all four carries plus the row_number share a single user_id
    exchange+sort (Catalyst mirrors the frame, not the data), so the
    operator costs exactly what ffill costs: one shuffle."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
        F.col("value")
    )
    g = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts", v.alias("v")
    ).withColumn("i", F.row_number().over(w))
    wi = Window.partitionBy("user_id").orderBy("i")
    wp = wi.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = wi.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    pv = F.last("v", ignorenulls=True).over(wp)
    pi = F.last(
        F.when(F.col("v").isNotNull(), F.col("i")), ignorenulls=True
    ).over(wp)
    nv = F.first("v", ignorenulls=True).over(wn)
    ni = F.first(
        F.when(F.col("v").isNotNull(), F.col("i")), ignorenulls=True
    ).over(wn)
    interp = F.when(F.col("v").isNotNull(), F.col("v")).when(
        pv.isNotNull() & nv.isNotNull(),
        pv + (nv - pv) * (F.col("i") - pi) / (ni - pi),
    )
    return g.select(
        "event_id",
        "user_id",
        F.round(interp - 1e-9, _R).alias("interpolated"),
    )


@register(
    "resample_ohlc",
    oracle=f"""
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, ts, event_id, value
      FROM events
    ),
    r AS (
      SELECT user_id, hour, value,
             row_number() OVER (PARTITION BY user_id, hour
                                ORDER BY ts, event_id)      AS rn_f,
             row_number() OVER (PARTITION BY user_id, hour
                                ORDER BY ts DESC, event_id DESC) AS rn_l
      FROM b
    )
    SELECT user_id, hour,
           round(max(CASE WHEN rn_f = 1 THEN value END) - 1e-9, {_R}) + 0.0
             AS open,
           round(max(value) - 1e-9, {_R}) + 0.0  AS high,
           round(min(value) - 1e-9, {_R}) + 0.0  AS low,
           round(max(CASE WHEN rn_l = 1 THEN value END) - 1e-9, {_R}) + 0.0
             AS close,
           count(*) AS n_events
    FROM r GROUP BY user_id, hour
    """,
)
def resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.resample('1h').ohlc() — open/high/low/close per key and
    time bucket, the candlestick rollup.  Open/close are
    ORDER-DETERMINISTIC first/last via struct-ordered min_by/max_by
    on (ts, event_id) — one plain hash aggregation, no window, no
    sort: the per-bucket extremes and endpoints all reduce map-side,
    so the shuffle carries |user × hour| rows regardless of corpus
    size (the oracle's row_number formulation is the semantic spec,
    not the plan)."""
    e = _events(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz")
    order = F.struct("ts", "event_id")
    return (
        e.groupBy("user_id", hour.alias("hour"))
        .agg(
            F.round(F.min_by("value", order) - 1e-9, _R).alias("open"),
            F.round(F.max("value") - 1e-9, _R).alias("high"),
            F.round(F.min("value") - 1e-9, _R).alias("low"),
            F.round(F.max_by("value", order) - 1e-9, _R).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "window_time_weighted_avg",
    oracle=f"""
    WITH d AS (
      SELECT user_id, value,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) - ts) AS dt
      FROM events
    )
    SELECT user_id,
           round(sum(value * dt) / sum(dt) - 1e-9, {_R}) + 0.0 AS twa_value,
           CAST(sum(dt) AS BIGINT) AS span_us
    FROM d WHERE dt IS NOT NULL
    GROUP BY user_id
    """,
)
def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per key (the tsdb `time_weight` /
    irregular-sampling mean): each observation holds until the next
    one, so it contributes value·Δt to the integral — robust where a
    plain avg over-weights bursts of closely-spaced events.  One lead
    window per user (single shuffle+sort) then a hash agg; the last
    observation per key has no holding interval and is excluded from
    numerator and denominator identically in both engines.  Δt is
    exact integer MICROSECONDS on both sides (unix_micros /
    epoch_us) — second-granularity floats truncate differently per
    engine and shift the integral by ±1s."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    dt = (F.lead(us).over(w) - us).alias("dt")
    d = e.select("user_id", "value", dt).filter(F.col("dt").isNotNull())
    return d.groupBy("user_id").agg(
        F.round(
            F.sum(F.col("value") * F.col("dt")) / F.sum("dt") - 1e-9, _R
        ).alias("twa_value"),
        F.sum("dt").cast("long").alias("span_us"),
    )


_CUSUM_TARGET = 50.0  # drift reference level
_CUSUM_ALARM = 120.0  # alarm threshold on the accumulated excess


@register(
    "window_cusum_drift",
    oracle=f"""
    WITH p AS (
      SELECT user_id, event_id, ts,
             sum(value - {_CUSUM_TARGET}) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pref
      FROM events
    ),
    m AS (
      SELECT user_id, event_id, pref,
             min(pref) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_min
      FROM p
    )
    SELECT user_id, event_id,
           round((pref - least(0, run_min)) - 1e-9, {_R}) + 0.0 AS cusum,
           round((pref - least(0, run_min)) - 1e-9, {_R}) + 0.0
             > {_CUSUM_ALARM} AS alarm
    FROM m
    """,
)
def window_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per key: the classic control
    chart S_i = max(0, S_{{i-1}} + (x_i − target)), which looks like
    an inherently sequential recurrence — and IS one — but closes
    into pure windows via the reflection identity
    S_i = P_i − min(0, min_{{j≤i}} P_j) over the prefix sums P.
    Both the prefix sum and its running minimum share one
    user-partitioned ordered frame, so the whole detector is a
    single exchange+sort with zero Python and an exact oracle —
    the pattern that turns 'needs a stateful UDF' into codegen
    (property-checked against the literal recurrence in
    tests/test_cusum_identity.py)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = F.sum(F.col("value") - F.lit(_CUSUM_TARGET)).over(w)
    e = _events(spark, sf_dir).select(
        "user_id", "event_id", "ts", pref.alias("pref")
    )
    run_min = F.min("pref").over(
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = F.col("pref") - F.least(F.lit(0.0), run_min)
    # the alarm compares the ROUNDED statistic: a raw float sitting
    # one ulp either side of the threshold across engines would flip
    # the boolean (observed once in 100k rows at sf0.1 — cusum
    # exactly at the 120.0 threshold); rounding first makes the
    # comparison engine-portable, and an alarm level meaningful to
    # 4 dp is the operational contract anyway.
    rounded = F.round(cusum - 1e-9, _R)
    return e.select(
        "user_id",
        "event_id",
        rounded.alias("cusum"),
        (rounded > _CUSUM_ALARM).alias("alarm"),
    )


@register(
    "window_autocorr_lag1",
    oracle=f"""
    WITH l AS (
      SELECT user_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_value
      FROM events
    ),
    g AS (
      SELECT user_id,
             corr(value, prev_value) AS c,
             count(CASE WHEN value IS NOT NULL AND prev_value IS NOT NULL
                        THEN 1 END) AS n_pairs
      FROM l GROUP BY user_id
    )
    SELECT user_id,
           CASE WHEN n_pairs >= 2 THEN round(c - 1e-9, {_R}) + 0.0 END AS acf1,
           n_pairs
    FROM g
    """,
)
def window_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per key — the standard 'is this series
    noise or signal' diagnostic (and the first ACF coefficient of any
    forecasting workup).  One per-key ordered window produces the
    shifted pair, one partial+final corr aggregate reduces it: the
    same single exchange+sort every shift-family query here rides.
    Degenerate inputs (under 2 pairs, or a zero-variance series)
    emit NULL explicitly: Spark's corr returns NaN in both cases
    where DuckDB returns NULL, so the guard — count AND isnan —
    makes the cross-engine contract exact."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _events(spark, sf_dir).select(
        "user_id", "value", F.lag("value").over(w).alias("prev_value")
    )
    g = e.groupBy("user_id").agg(
        F.corr("value", "prev_value").alias("c"),
        F.count(
            F.when(
                F.col("value").isNotNull() & F.col("prev_value").isNotNull(), 1
            )
        ).alias("n_pairs"),
    )
    return g.select(
        "user_id",
        F.when(
            (F.col("n_pairs") >= 2) & ~F.isnan(F.col("c")),
            F.round(F.col("c") - 1e-9, _R) + 0.0,
        ).alias("acf1"),
        "n_pairs",
    )


# Each event opens a usage interval of max(value, 1) seconds — the
# canonical gaps-and-islands fixture (sessions, locks, meetings).
_IV_SQL = """
    SELECT user_id,
           epoch_us(ts) AS s,
           epoch_us(ts) + CAST(floor(greatest(value, 1) * 1e6) AS BIGINT) AS e
    FROM events
"""


@register(
    "intervals_union_length",
    oracle=f"""
    WITH iv AS ({_IV_SQL}),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775808)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
      FROM flagged
    ),
    per_island AS (
      SELECT user_id, island_id, max(e) - min(s) AS len_us
      FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id, count(*) AS n_islands,
           CAST(sum(len_us) AS BIGINT) AS covered_us
    FROM per_island GROUP BY user_id
    """,
)
def intervals_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval UNION per key (gaps-and-islands): total covered time
    and number of disjoint busy periods when each event holds the
    resource for max(value,1) seconds.  The classic 'how long was
    the machine actually busy' question that naive sum-of-durations
    double-counts.  One per-key ordered window finds island starts
    (start beyond the running max of every earlier end — the running
    max, not lag(e), is what makes nested containment correct), a
    running sum numbers the islands, and a groupBy measures them:
    one exchange+sort, two partial aggs, no self-join — vs the
    quadratic interval-overlap self-join this replaces.  Arithmetic
    rides epoch microseconds so both engines agree bit-exactly."""
    e = _events(spark, sf_dir)
    iv = e.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (F.greatest(F.col("value"), F.lit(1.0)) * 1e6).cast("long")
        ).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id", "s", "e",
        F.when(
            F.col("s") > F.coalesce(prev_max_e, F.lit(-(2**63))), 1
        ).otherwise(0).alias("new_island"),
    )
    islands = flagged.select(
        "user_id", "s", "e",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("island_id"),
    )
    per_island = islands.groupBy("user_id", "island_id").agg(
        (F.max("e") - F.min("s")).alias("len_us")
    )
    return per_island.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.sum("len_us").alias("covered_us"),
    )


@register(
    "intervals_peak_concurrency",
    oracle=f"""
    WITH iv AS ({_IV_SQL}),
    pts AS (
      SELECT user_id, s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT user_id, e, -1 FROM iv
    ),
    run AS (
      SELECT user_id,
             sum(delta) OVER (
               PARTITION BY user_id ORDER BY t, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS level
      FROM pts
    )
    SELECT user_id, CAST(max(level) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY user_id
    """,
)
def intervals_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent intervals per key — max simultaneous sessions
    / connections / holds.  Sweep-line as pure relational algebra:
    every interval explodes to (+1 at start, −1 at end) breakpoints,
    one ordered window accumulates the level, one agg takes the max.
    Intervals are closed-open ([s, e)): ordering ties by delta puts
    the −1 first so back-to-back intervals never double-count.  Two
    narrow projections + one exchange — the same cost as one window
    query, where the textbook formulation is an O(n²) overlap
    self-join."""
    e = _events(spark, sf_dir)
    iv = e.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (F.greatest(F.col("value"), F.lit(1.0)) * 1e6).cast("long")
        ).alias("e"),
    )
    pts = iv.select(
        "user_id", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select("user_id", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.partitionBy("user_id").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = pts.select("user_id", F.sum("delta").over(w).alias("level"))
    return run.groupBy("user_id").agg(F.max("level").alias("peak_concurrency"))


_BURST_FACTOR = 1.5


@register(
    "events_burst_days",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('day', ts) AS hr, count(*) AS n
      FROM events GROUP BY user_id, hr
    ),
    base AS (
      SELECT user_id, quantile_cont(n, 0.5) AS med
      FROM hourly GROUP BY user_id
    )
    SELECT h.user_id, h.hr AS burst_day, h.n AS n_events,
           round(b.med - 1e-9, {_R}) + 0.0 AS median_daily
    FROM hourly h JOIN base b ON b.user_id = h.user_id
    WHERE h.n > {_BURST_FACTOR} * b.med
    """,
)
def events_burst_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: days where a user's event rate exceeds
    1.5x (_BURST_FACTOR) their own MEDIAN daily rate — the rate-anomaly primitive
    behind abuse flags and pager alerts, robust because the
    baseline is a median (one hot hour cannot inflate its own
    threshold the way a mean baseline would).  Two partial aggs
    (daily counts, then the per-user median over the BOUNDED
    days-per-user table — where the interpolating percentile is
    safe) and a broadcast join of the |users|-row baseline back
    onto the daily table."""
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    base = hourly.groupBy("user_id").agg(
        F.percentile("n", F.lit(0.5)).alias("med")
    )
    return (
        hourly.join(F.broadcast(base), "user_id")
        .filter(F.col("n") > _BURST_FACTOR * F.col("med"))
        .select(
            "user_id",
            F.col("hr").alias("burst_day"),
            F.col("n").alias("n_events"),
            F.round(F.col("med") - 1e-9, _R).alias("median_daily"),
        )
    )


@register(
    "window_zscore_rolling",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_id, value,
             avg(value) OVER w AS ma,
             stddev_samp(value) OVER w AS sd,
             count(*) OVER w AS n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           round((value - ma) / sd - 1e-9, {_R}) + 0.0 AS z,
           abs(round((value - ma) / sd - 1e-9, {_R}) + 0.0) > 2 AS is_anomaly
    FROM r
    WHERE n >= 5 AND sd > 0
    """,
)
def window_zscore_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags — each value scored against the
    TRAILING 10 observations' mean/std (frame ends at 1 PRECEDING:
    the point under test never contaminates its own baseline, the
    mistake that makes naive rolling z-scores blind to level
    shifts).  Warm-up rows (fewer than 5 priors) and zero-variance
    frames are excluded identically on both engines.  One
    exchange+sort like every rolling query; the CUSUM detector is
    the cumulative complement of this pointwise one."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, -1)
    )
    e = _events(spark, sf_dir).select(
        "user_id", "event_id", "value",
        F.avg("value").over(w).alias("ma"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("*").over(w).alias("n"),
    )
    z = (F.col("value") - F.col("ma")) / F.col("sd")
    return (
        e.filter((F.col("n") >= 5) & (F.col("sd") > 0))
        .select(
            "user_id", "event_id",
            (F.round(z - 1e-9, _R) + 0.0).alias("z"),
            # rounded-threshold comparison — see window_zscore_anomaly
            (F.abs(F.round(z - 1e-9, _R)) > 2).alias("is_anomaly"),
        )
    )


@register(
    "window_max_drawdown",
    oracle=f"""
    WITH r AS (
      SELECT user_id, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_max
      FROM events
    )
    SELECT user_id,
           round(max(run_max) - 1e-9, {_R}) + 0.0 AS peak,
           round(min(value / nullif(run_max, 0) - 1.0) - 1e-9, {_R}) + 0.0
             AS max_drawdown
    FROM r GROUP BY user_id
    """,
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over the time-ordered value series —
    the canonical risk metric (largest peak-to-trough drop as a
    fraction of the running peak), and the same running-max-then-
    reduce shape as SLA 'worst regression from best' monitoring.
    One per-key ordered window (running max) + one partial-agg
    groupBy — no self-join over time, which the quadratic
    'for each point find prior peak' formulation would need.
    A leading run of zero values makes run_max = 0 (sf0.1 DOES
    contain zero-valued events), so the ratio guards with
    nullif(run_max, 0) in both engines — rows before the first
    nonzero peak contribute NULL and min skips them, identically on
    both sides, instead of raising DIVIDE_BY_ZERO under ANSI."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = _events(spark, sf_dir)
    r = e.select(
        "user_id", "value", F.max("value").over(w).alias("run_max")
    )
    return r.groupBy("user_id").agg(
        (F.round(F.max("run_max") - 1e-9, _R) + F.lit(0.0)).alias("peak"),
        (
            F.round(
                F.min(
                    F.col("value") / F.nullif(F.col("run_max"), F.lit(0.0))
                    - 1.0
                )
                - 1e-9,
                _R,
            )
            + F.lit(0.0)
        ).alias("max_drawdown"),
    )


@register(
    "events_markov_transitions",
    oracle=f"""
    WITH pairs AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    cnt AS (
      SELECT cur, nxt, count(*) AS n FROM pairs
      WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY cur) - 1e-9, {_R}) + 0.0 AS p
    FROM cnt
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: for
    each consecutive event pair within a user's time-ordered stream,
    P(next type | current type) — the path-analytics summary behind
    'where do users go from here' sankeys and behavioral anomaly
    scores (low-probability transitions).  One per-user ordered
    window builds the consecutive pairs, one partial-agg groupBy
    counts them; the row-normalization window runs over the
    |types|² count table — bounded, never data-sized."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _events(spark, sf_dir)
    pairs = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cnt = pairs.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    wn = Window.partitionBy("cur")
    return cnt.select(
        "cur", "nxt", "n",
        (
            F.round(
                F.col("n").cast("double") / F.sum("n").over(wn) - 1e-9, _R
            )
            + F.lit(0.0)
        ).alias("p"),
    )


@register(
    "sort_global_rank_scalable",
    oracle="""
    SELECT event_id,
           row_number() OVER (ORDER BY ts, event_id) AS pos
    FROM events
    """,
)
def sort_global_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order positions WITHOUT a single-task window —
    the scale-safe twin of sort_values_global (whose unpartitioned
    row_number deliberately funnels all rows through one task and is
    documented as a bounded-verification exception).  Two-pass
    partition-offset ranking (operators/rank.py): range-partition on
    the sort keys, local row numbers per physical partition, tiny
    per-partition count table -> cumulative offsets broadcast back,
    position = offset + local number.  Deterministic despite the
    sampled range boundaries because (ts, event_id) is a total
    order: position = global rank by key wherever the cuts land.
    This is how set_index/global rank actually ships at 100 TB."""
    from ondemand_dask_spark.operators.rank import global_row_numbers

    _CACHES.evict()
    e = _events(spark, sf_dir).select("event_id", "ts")
    ranked = global_row_numbers(
        e, "ts", "event_id", col_name="pos", retain=_CACHES.retain
    )
    return ranked.select("event_id", "pos")


_GAP_MIN_US = 6 * 3600 * 1_000_000  # report gaps longer than 6h


@register(
    "window_gap_detection",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS gap_start,
             ts AS gap_end,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id, gap_start, gap_end, CAST(gap_us AS BIGINT) AS gap_us
    FROM g WHERE gap_us > {_GAP_MIN_US}
    """,
)
def window_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-gap report — the monitoring question sessionization
    throws away: WHICH silences exceeded the SLA, when did each
    start and end, and how long was it.  (sessionize_gap returns the
    activity islands; this returns their complement.)  One per-user
    lag window, then a filter — the gap rows are the plan's only
    output, so at 100 TB the report stays proportional to the number
    of violations, not to the event volume."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = e.select(
        "user_id",
        F.lag("ts").over(w).alias("gap_start"),
        F.col("ts").alias("gap_end"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )
    return g.filter(F.col("gap_us") > _GAP_MIN_US)


@register(
    "ts_seasonal_decompose",
    oracle=f"""
    WITH base AS (
      SELECT event_type, extract(hour FROM ts) AS hod, value FROM events
    ),
    seas AS (
      SELECT event_type, hod, avg(value) AS s, count(*) AS n
      FROM base GROUP BY event_type, hod
    ),
    g AS (
      SELECT event_type, avg(value) AS gmean, var_pop(value) AS vtot
      FROM base GROUP BY event_type
    )
    SELECT s.event_type,
           round(sum(s.n * (s.s - g.gmean) * (s.s - g.gmean))
                 / sum(s.n) / g.vtot - 1e-9, {_R}) + 0.0
             AS seasonal_strength,
           round(max(s.s) - min(s.s) - 1e-9, {_R}) + 0.0 AS seasonal_range
    FROM seas s JOIN g USING (event_type)
    GROUP BY s.event_type, g.vtot
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength decomposition per series: the hour-of-day
    seasonal profile (a 24-bucket group mean) and the fraction of
    total variance it explains — var(seasonal) / var(total), the
    'is there a daily cycle worth modeling' screen run before any
    forecasting work.  Both components are vocabulary-sized
    aggregations (|series|×24 and |series| rows) over one scan with
    full partial aggregation; the profile-vs-total join is broadcast.
    Nothing in the plan grows with data volume — the 100 TB shape is
    the sf0.001 shape."""
    e = _events(spark, sf_dir)
    base = e.select(
        "event_type", F.hour("ts").alias("hod"), "value"
    )
    seas = base.groupBy("event_type", "hod").agg(
        F.avg("value").alias("s"), F.count("*").alias("n")
    )
    g = base.groupBy("event_type").agg(
        F.avg("value").alias("gmean"), F.var_pop("value").alias("vtot")
    )
    d = F.col("s") - F.col("gmean")
    return (
        seas.join(F.broadcast(g), "event_type")
        .groupBy("event_type", "vtot")
        .agg(
            (
                F.round(
                    F.sum(F.col("n") * d * d) / F.sum("n") / F.col("vtot")
                    - 1e-9,
                    _R,
                )
                + 0.0
            ).alias("seasonal_strength"),
            (F.round(F.max("s") - F.min("s") - 1e-9, _R) + 0.0).alias(
                "seasonal_range"
            ),
        )
        .drop("vtot")
    )


_SNAIVE_LAG_DAYS = 7


@register(
    "ts_seasonal_naive_eval",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             sum(value) AS total
      FROM events GROUP BY event_type, d
    ),
    j AS (
      SELECT a.event_type, a.total AS y, b.total AS yhat
      FROM daily a
      JOIN daily b ON b.event_type = a.event_type
                  AND b.d = a.d - {_SNAIVE_LAG_DAYS}
    )
    SELECT event_type, count(*) AS n_days,
           round(avg(abs(y - yhat)) - 1e-9, {_R}) + 0.0 AS mae,
           round(avg(abs(y - yhat) / nullif(abs(y), 0)) - 1e-9, {_R}) + 0.0
             AS mape
    FROM j GROUP BY event_type
    """,
)
def ts_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — yhat(d) = y(d − 7) on the
    per-series daily totals, scored with MAE/MAPE.  The baseline
    every real forecasting pipeline must beat, and the benchmark
    harness's sanity metric.  The lag attaches by an EQUI-join on
    (series, date − 7) rather than a lag() window: gap days drop out
    naturally (lag() over a sparse calendar silently compares
    neighbors k ROWS apart, not k days), and the join stays
    key-partitioned on the same grouping the daily rollup already
    shuffled on — at 100 TB the daily table is vocabulary-sized
    anyway."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(F.sum("value").alias("total"))
    a = daily.alias("a")
    b = daily.alias("b")
    j = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.d") == F.date_sub(F.col("a.d"), _SNAIVE_LAG_DAYS)),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.total").alias("y"),
        F.col("b.total").alias("yhat"),
    )
    err = F.abs(F.col("y") - F.col("yhat"))
    # MAPE's per-day term divides by |y|: a day whose total is exactly
    # 0 must contribute NULL (avg skips it), not raise DIVIDE_BY_ZERO
    # under Spark 4 ANSI mode — nullif-guarded identically in the
    # oracle so both engines skip the same days.
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        (F.round(F.avg(err) - 1e-9, _R) + 0.0).alias("mae"),
        (
            F.round(
                F.avg(err / F.nullif(F.abs(F.col("y")), F.lit(0.0))) - 1e-9,
                _R,
            )
            + 0.0
        ).alias("mape"),
    )


@register(
    "ts_changepoint_binary",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             sum(value) AS y
      FROM events GROUP BY event_type, d
    ),
    pre AS (
      SELECT event_type, d, y,
             row_number() OVER w AS i,
             sum(y)     OVER w AS cy,
             sum(y * y) OVER w AS cy2,
             count(*)   OVER (PARTITION BY event_type) AS n,
             sum(y)     OVER (PARTITION BY event_type) AS ty,
             sum(y * y) OVER (PARTITION BY event_type) AS ty2
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    scored AS (
      SELECT event_type, d, i, n,
             round((ty2 - ty * ty / n)
                   - ((cy2 - cy * cy / i)
                      + ((ty2 - cy2) - (ty - cy) * (ty - cy) / (n - i)))
                   - 1e-9, {_R}) + 0.0
               AS sse_r
      FROM pre WHERE i < n
    ),
    best AS (
      SELECT event_type, d AS change_day, sse_r,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY sse_r DESC, d) AS rn
      FROM scored
    )
    SELECT event_type, change_day, sse_r AS sse_reduction
    FROM best WHERE rn = 1
    """,
)
def ts_changepoint_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection (binary segmentation, first
    split) on each series' daily totals: the split day maximizing the
    drop in summed squared error when the series is modeled as two
    constant segments instead of one — the standard level-shift
    monitor for volume/revenue series.  Every candidate split is
    scored in O(1) from PREFIX sums (Σy, Σy² running per series +
    series totals), so scoring all n−1 candidates is one window pass
    over the DAY-grain table — vocabulary-sized regardless of raw
    volume; the raw scan contributes only the daily rollup.  All
    windows are partitioned by series (never global).  Recursing on
    the two halves gives full binary segmentation; each level is this
    same plan on a filtered day range."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
    ).agg(F.sum("value").alias("y"))
    wp = Window.partitionBy("event_type")
    w = wp.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "event_type",
        "d",
        F.row_number().over(wp.orderBy("d")).alias("i"),
        F.sum("y").over(w).alias("cy"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("cy2"),
        F.count("*").over(wp).alias("n"),
        F.sum("y").over(wp).alias("ty"),
        F.sum(F.col("y") * F.col("y")).over(wp).alias("ty2"),
    )
    i, n = F.col("i").cast("double"), F.col("n").cast("double")
    cy, cy2 = F.col("cy"), F.col("cy2")
    ty, ty2 = F.col("ty"), F.col("ty2")
    sse_drop = (ty2 - ty * ty / n) - (
        (cy2 - cy * cy / i)
        + ((ty2 - cy2) - (ty - cy) * (ty - cy) / (n - i))
    )
    # Rank on the ROUNDED statistic (repo-standard round-before-compare
    # discipline): ty/cy prefix sums can differ by an ulp between
    # engines, and two near-tied candidate days must resolve to the
    # same change_day on both sides — the d tiebreak then decides.
    scored = pre.filter(F.col("i") < F.col("n")).select(
        "event_type",
        "d",
        (F.round(sse_drop - 1e-9, _R) + 0.0).alias("sse_r"),
    )
    best = scored.withColumn(
        "rn",
        F.row_number().over(
            wp.orderBy(F.desc("sse_r"), F.asc("d"))
        ),
    ).filter(F.col("rn") == 1)
    return best.select(
        "event_type",
        F.col("d").cast("timestamp").alias("change_day"),
        F.col("sse_r").alias("sse_reduction"),
    )


_ACF_MAX_LAG = 7

_ACF_UNION = "\n      UNION ALL ".join(
    f"SELECT event_type, {k} AS lag_k, tot, p{k} AS prev FROM l"
    for k in range(1, _ACF_MAX_LAG + 1)
)


@register(
    "ts_acf_correlogram",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             sum(value) AS tot
      FROM events GROUP BY 1, 2
    ),
    l AS (
      SELECT event_type, tot,
             {", ".join(f"lag(tot, {k}) OVER w AS p{k}"
                        for k in range(1, _ACF_MAX_LAG + 1))}
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    u AS (
      {_ACF_UNION}
    ),
    g AS (
      SELECT event_type, lag_k, corr(tot, prev) AS c,
             count(CASE WHEN tot IS NOT NULL AND prev IS NOT NULL
                        THEN 1 END) AS n_pairs
      FROM u GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag_k AS BIGINT) AS lag_k,
           CASE WHEN n_pairs >= 2
                THEN round(c - 1e-9, {_R}) + 0.0 END AS acf,
           n_pairs
    FROM g
    """,
)
def ts_acf_correlogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function at lags 1..7 of each series' daily
    total — the correlogram a forecaster reads before picking model
    order (lag-7 spikes = weekly seasonality; slow decay = trend).
    Extends window_autocorr_lag1 from one coefficient to the full
    head of the ACF.

    Scale shape: the raw scan collapses to |series|×|days| daily
    totals in one partial-agg shuffle; ONE ordered window per series
    over that vocabulary-sized table emits all seven shifted columns
    in a single sort (not seven), and an unpivot + (series, lag)
    hash-agg reduces them.  Nothing downstream of the first agg grows
    with data volume.  Degenerate series (under 2 pairs at a lag, or
    zero variance → Spark NaN vs DuckDB NULL) pin to NULL identically
    on both engines."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.sum("value").alias("tot"))
    w = Window.partitionBy("event_type").orderBy("d")
    shifted = daily.select(
        "event_type",
        "tot",
        *[
            F.lag("tot", k).over(w).alias(f"p{k}")
            for k in range(1, _ACF_MAX_LAG + 1)
        ],
    )
    stack = ", ".join(
        f"{k}L, p{k}" for k in range(1, _ACF_MAX_LAG + 1)
    )
    u = shifted.select(
        "event_type",
        "tot",
        F.expr(
            f"stack({_ACF_MAX_LAG}, {stack}) AS (lag_k, prev)"
        ),
    )
    g = u.groupBy("event_type", "lag_k").agg(
        F.corr("tot", "prev").alias("c"),
        F.count(
            F.when(
                F.col("tot").isNotNull() & F.col("prev").isNotNull(), 1
            )
        ).alias("n_pairs"),
    )
    return g.select(
        "event_type",
        "lag_k",
        F.when(
            (F.col("n_pairs") >= 2) & ~F.isnan(F.col("c")),
            F.round(F.col("c") - 1e-9, _R) + 0.0,
        ).alias("acf"),
        "n_pairs",
    )


@register(
    "window_rolling_slope",
    oracle=f"""
    SELECT event_id, user_id,
           round((covar_samp(value, x) OVER w
                  / NULLIF(var_samp(x) OVER w, 0)) - 1e-9, {_R})
             + 0.0 AS roll_slope
    FROM (SELECT event_id, user_id, value,
                 CAST(row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                      AS DOUBLE) AS x
          FROM events WHERE value IS NOT NULL)
    WINDOW w AS (PARTITION BY user_id ORDER BY x
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling least-squares trend per key: the OLS slope of `value`
    against event position over the trailing 10 observations — the
    'is this metric locally rising or falling' detector (the window
    analogue of stat_theil_sen_slope's global fit).  Regressing on
    the in-key row POSITION rather than the epoch timestamp is
    deliberate: positions are small exact integers, so the
    covar/var sums stay numerically identical across engines where
    epoch-scale abscissae (~1.7e9) lose low bits differently.

    One user_id exchange+sort serves both the position column and
    the frame; slope = covar_samp/var_samp as algebraic window
    aggregates (no per-frame recomputation).  Single-point and
    constant-x frames divide by zero — try_divide/NULLIF pins both
    engines to SQL NULL (same contract as window_rolling_corr)."""
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    pos = e.select(
        "event_id",
        "user_id",
        "value",
        F.row_number().over(wp).cast("double").alias("x"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(-9, 0)
    )
    slope = F.try_divide(
        F.covar_samp(F.col("value"), F.col("x")).over(w),
        F.nullif(F.var_samp("x").over(w), F.lit(0.0)),
    )
    return pos.select(
        "event_id",
        "user_id",
        (F.round(slope - 1e-9, _R) + 0.0).alias("roll_slope"),
    )


@register(
    "ts_seasonal_zscore",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             round(sum(value) - 1e-9, 6) + 0.0 AS x
      FROM events GROUP BY 1, 2
    ),
    season AS (
      SELECT event_type, dayofweek(d) AS dow,
             avg(x) AS mu, stddev_samp(x) AS sigma,
             count(*) AS n_obs
      FROM daily GROUP BY 1, 2
    )
    SELECT daily.event_type, d, x,
           CAST(season.n_obs AS BIGINT) AS n_same_dow,
           round((x - mu) / nullif(sigma, 0) - 1e-9, {_R}) + 0.0
             AS seasonal_z,
           coalesce(abs(round((x - mu) / nullif(sigma, 0) - 1e-9, {_R}))
                    > 2.0, FALSE) AS anomaly
    FROM daily
    JOIN season ON daily.event_type = season.event_type
              AND dayofweek(d) = season.dow
    """,
)
def ts_seasonal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-adjusted anomaly score: each daily total is z-scored
    against the history of the SAME day-of-week for its series —
    the seasonal variant of window_zscore_anomaly that stops Sunday
    from alarming merely for being Sunday (raw z-scores on weekly-
    seasonal traffic flag every weekend; deseasonalized ones flag
    only real deviations).

    Scale shape: the scan collapses to the calendar-bounded daily
    table; the seasonal profile is a 7-row-per-series aggregate
    joined back (both sides vocabulary-sized).  Totals round to 6 dp
    before profiling, the z compares on the ROUNDED statistic, and a
    zero-variance weekday (all its days identical) pins z to NULL —
    with the anomaly flag coalesced to FALSE — on both engines."""
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("d"),
        )
        .agg((F.round(F.sum("value") - 1e-9, 6) + 0.0).alias("x"))
    )
    season = daily.groupBy(
        "event_type", F.dayofweek("d").alias("dow")
    ).agg(
        F.avg("x").alias("mu"),
        F.stddev_samp("x").alias("sigma"),
        F.count("*").cast("long").alias("n_obs"),
    )
    z = F.round(
        (F.col("x") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0))
        - 1e-9,
        _R,
    )
    return (
        daily.withColumn("dow", F.dayofweek("d"))
        .join(F.broadcast(season), ["event_type", "dow"])
        .select(
            "event_type",
            "d",
            "x",
            F.col("n_obs").alias("n_same_dow"),
            (z + 0.0).alias("seasonal_z"),
            F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("anomaly"),
        )
    )


_VRF_BAND = 5.0  # value-range half-width


@register(
    "window_value_range_frame",
    oracle=f"""
    SELECT event_id, user_id, value,
           CAST(count(*) OVER w AS BIGINT) AS n_similar,
           round(avg(value) OVER w - 1e-9, {_R}) + 0.0 AS avg_similar
    FROM events
    WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY value
                 RANGE BETWEEN {_VRF_BAND} PRECEDING
                       AND {_VRF_BAND} FOLLOWING)
    """,
)
def window_value_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based RANGE frame: for each event, the count and mean of
    the same user's events whose value lies within ±{_VRF_BAND} of
    it — 'how typical is this amount for this account', the local-
    density feature behind amount-anomaly scoring.  Completes the
    window-frame surface: rolling_rows is ROWS-framed,
    rolling_time is time-RANGE-framed, this is numeric-RANGE-framed
    (frame membership decided by VALUE distance, not position — a
    frame no row-count window can express).

    Scale shape: one user-keyed exchange + per-key sort serves the
    whole window; Spark evaluates the range frame with two moving
    pointers over the sorted run (each advances monotonically — the
    frame is O(run), not O(run²)).  Frame BOUNDARIES compare raw
    parquet doubles — bit-identical across engines — so no rounding
    is needed for membership, only for the reported mean."""
    # the Python rangeBetween API only accepts integral offsets, so
    # the fractional value-range frame is expressed in SQL form
    wsql = (
        "PARTITION BY user_id ORDER BY value "
        f"RANGE BETWEEN {_VRF_BAND} PRECEDING AND {_VRF_BAND} FOLLOWING"
    )
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    return e.selectExpr(
        "event_id",
        "user_id",
        "value",
        f"CAST(count(*) OVER ({wsql}) AS LONG) AS n_similar",
        f"round(avg(value) OVER ({wsql}) - 1e-9, {_R}) + 0.0"
        " AS avg_similar",
    )


_LB_MAX_LAG = 7


@register(
    "stat_ljung_box",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             sum(value) AS tot
      FROM events GROUP BY 1, 2
    ),
    l AS (
      SELECT event_type, tot,
             {", ".join(f"lag(tot, {k}) OVER w AS p{k}"
                        for k in range(1, _LB_MAX_LAG + 1))}
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             {", ".join(
                 f"round(corr(tot, p{k}) - 1e-9, {_R}) + 0.0 AS r{k}"
                 for k in range(1, _LB_MAX_LAG + 1))}
      FROM l GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           {_LB_MAX_LAG} AS df,
           round(n * (n + 2) * ({" + ".join(
               f"r{k} * r{k} / (n - {k})"
               for k in range(1, _LB_MAX_LAG + 1))})
                 - 1e-9, {_R}) + 0.0 AS q_stat
    FROM g
    """,
)
def stat_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test per event-type daily series:
    Q = n(n+2)·Σ ρ_k²/(n−k) over lags 1..{_LB_MAX_LAG} — the formal
    'is this series white noise' decision that the ACF correlogram
    (ts_acf_correlogram) eyeballs.  Large Q rejects independence →
    the series has structure worth modeling; the residual-diagnosis
    step after any forecast fit (ts_seasonal_naive_eval).  ρ_k here
    is the sample correlation of the series with its lag-k shift
    (the same estimator the correlogram reports), computed over the
    overlap pairs.

    Scale shape: same as the correlogram — the scan collapses to
    |series|×|days| daily totals; ONE ordered window per series
    emits all {_LB_MAX_LAG} shifted columns in a single sort; the
    correlations are algebraic aggregates of that bounded table.
    Each ρ_k ROUNDS before entering Q on both engines, so the
    statistic is built from identical addends."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.sum("value").alias("tot"))
    w = Window.partitionBy("event_type").orderBy("d")
    shifted = daily.select(
        "event_type",
        "tot",
        *[
            F.lag("tot", k).over(w).alias(f"p{k}")
            for k in range(1, _LB_MAX_LAG + 1)
        ],
    )
    g = shifted.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        *[
            (F.round(F.corr("tot", f"p{k}") - 1e-9, _R) + 0.0).alias(
                f"r{k}"
            )
            for k in range(1, _LB_MAX_LAG + 1)
        ],
    )
    n = F.col("n")
    q = n * (n + 2) * sum(
        F.col(f"r{k}") * F.col(f"r{k}") / (n - k)
        for k in range(1, _LB_MAX_LAG + 1)
    )
    return g.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.lit(_LB_MAX_LAG).alias("df"),
        (F.round(q - 1e-9, _R) + 0.0).alias("q_stat"),
    )


_DES_A = 0.4  # Brown double-smoothing alpha


@register(
    "ts_double_exp_smoothing",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, sum(value) AS x
      FROM events GROUP BY 1, 2
    ),
    c1 AS (
      SELECT event_type, day, x,
             list(x) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS ch
      FROM daily
    ),
    v1 AS (
      SELECT event_type, day, x,
             list_dot_product(ch,
               list_transform(generate_series(len(ch) - 1, 0, -1),
                              i -> pow({1 - _DES_A}, i)))
             / ((1 - pow({1 - _DES_A}, len(ch))) / {_DES_A}) AS s1
      FROM c1
    ),
    c2 AS (
      SELECT event_type, day, x, s1,
             list(s1) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS ch
      FROM v1
    ),
    v2 AS (
      SELECT event_type, day, x, s1,
             list_dot_product(ch,
               list_transform(generate_series(len(ch) - 1, 0, -1),
                              i -> pow({1 - _DES_A}, i)))
             / ((1 - pow({1 - _DES_A}, len(ch))) / {_DES_A}) AS s2
      FROM c2
    )
    SELECT event_type, day,
           round(x - 1e-9, {_R}) + 0.0 AS y,
           round(s1 - 1e-9, {_R}) + 0.0 AS s1,
           round(s2 - 1e-9, {_R}) + 0.0 AS s2,
           round(2 * s1 - s2
                 + ({_DES_A} / {1 - _DES_A}) * (s1 - s2)
                 - 1e-9, {_R}) + 0.0 AS forecast_next
    FROM v2 ORDER BY event_type, day
    """,
)
def ts_double_exp_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing (the trend-aware
    forecaster: level = 2*S1 - S2, trend = a/(1-a)*(S1 - S2),
    one-step forecast = level + trend) over the per-type daily
    totals — the next rung above ts_seasonal_naive_eval's baseline
    and the classic capacity-planning projection.  S1 is the
    adjusted EWM of the series, S2 the EWM of S1; both are computed
    CLOSED-FORM as weighted dot products over an ordered expanding
    frame (weights (1-a)^age), not as a stateful recursion — the
    same de-recursion trick as window_ewm_bounded, exact here
    because the daily series is calendar-bounded (len <= 31), so no
    truncation is needed.

    Scale shape: one partial-agg groupBy collapses the fact table
    to the (type, day) vocabulary; both smoothing passes are
    windows PARTITIONED by series over calendar-bounded frames —
    at 100 TB the expensive table never enters a window.  Both
    engines fold the dot product in identical element order
    (oldest first), so the only cross-engine noise is pow() ulps,
    absorbed by the output rounding."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day"),
    ).agg(F.sum("value").alias("x"))
    wo = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def ewm_of(col: str) -> Column:
        ch = F.collect_list(col).over(wo)
        n = F.size(ch)
        num = F.aggregate(
            F.zip_with(
                ch,
                F.sequence(n - 1, F.lit(0), F.lit(-1)),
                lambda v, age: v * F.pow(F.lit(1.0 - _DES_A),
                                         age.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        den = (
            F.lit(1.0) - F.pow(F.lit(1.0 - _DES_A), n.cast("double"))
        ) / F.lit(_DES_A)
        return num / den

    v1 = daily.select("event_type", "day", "x", ewm_of("x").alias("s1"))
    v2 = v1.select("event_type", "day", "x", "s1", ewm_of("s1").alias("s2"))
    s1, s2 = F.col("s1"), F.col("s2")
    return v2.select(
        "event_type",
        "day",
        (F.round(F.col("x") - 1e-9, _R) + 0.0).alias("y"),
        (F.round(s1 - 1e-9, _R) + 0.0).alias("s1"),
        (F.round(s2 - 1e-9, _R) + 0.0).alias("s2"),
        (
            F.round(
                2 * s1 - s2
                + (_DES_A / (1.0 - _DES_A)) * (s1 - s2)
                - 1e-9,
                _R,
            )
            + 0.0
        ).alias("forecast_next"),
    ).orderBy("event_type", "day")
