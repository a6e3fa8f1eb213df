"""Unit pins for bugs the full sf0.1 differential drive caught —
inputs engineered so the failure mode exists at ANY scale factor.
"""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _mini_events(spark, values):
    t0 = datetime.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "event_id": range(1, len(values) + 1),
            "ts": [t0 + datetime.timedelta(minutes=i) for i in range(len(values))],
            "user_id": [1] * len(values),
            "value": values,
        }
    )
    return spark.createDataFrame(pdf)


def test_pct_change_zero_base_yields_null_not_error(spark):
    """A previous value of exactly 0 must produce NULL, not ANSI
    DIVIDE_BY_ZERO (sf0.1 drive regression)."""
    e = _mini_events(spark, [0.0, 5.0, 10.0])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    out = e.select(
        "event_id",
        F.round(
            F.col("value") / F.nullif(F.lag("value").over(w), F.lit(0))
            - 1
            - 1e-9,
            4,
        ).alias("pct_change"),
    ).collect()
    got = {r.event_id: r.pct_change for r in out}
    assert got[1] is None          # no previous row
    assert got[2] is None          # previous value == 0 -> NULL
    assert abs(got[3] - 1.0) < 1e-9


def test_cusum_alarm_at_exact_threshold_is_stable(spark):
    """A raw CUSUM landing exactly on the alarm threshold must
    compare on the ROUNDED statistic (one-ulp engine divergence
    flipped the boolean at sf0.1).  120.0 > 120.0 is False — in
    every engine, every time."""
    from ondemand_dask_spark.queries.windows import (
        _CUSUM_ALARM,
        _CUSUM_TARGET,
    )

    # one event whose excess over target EQUALS the alarm threshold
    e = _mini_events(spark, [_CUSUM_TARGET + _CUSUM_ALARM])
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = F.sum(F.col("value") - F.lit(_CUSUM_TARGET)).over(w)
    run_min = F.min(pref).over(w)
    cusum = pref - F.least(F.lit(0.0), run_min)
    rounded = F.round(cusum - 1e-9, 4)
    row = e.select(
        rounded.alias("cusum"), (rounded > _CUSUM_ALARM).alias("alarm")
    ).collect()[0]
    assert row.cusum == _CUSUM_ALARM
    assert row.alarm is False


def test_max_drawdown_zero_leading_peak_yields_null_not_error(spark):
    """A user whose series STARTS at value 0 has run_max = 0 until
    the first nonzero value — the ratio must skip those rows via
    nullif, not raise ANSI DIVIDE_BY_ZERO (sf0.1 contains
    zero-valued events; an unlucky ordering makes one lead a
    partition)."""
    e = _mini_events(spark, [0.0, 0.0, 10.0, 4.0])
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = e.select(
        "user_id", "value", F.max("value").over(w).alias("run_max")
    )
    out = r.groupBy("user_id").agg(
        F.round(
            F.min(
                F.col("value") / F.nullif(F.col("run_max"), F.lit(0.0)) - 1.0
            )
            - 1e-9,
            4,
        ).alias("max_drawdown")
    ).collect()
    # rows 1-2 (run_max 0) are skipped; worst ratio is 4/10 - 1
    assert abs(out[0].max_drawdown - (-0.6)) < 1e-9


def test_seasonal_naive_mape_zero_actual_is_skipped(spark):
    """MAPE's per-day |err|/|y| term must contribute NULL (skipped by
    avg) when the actual y is exactly 0, matching the
    nullif-guarded oracle, instead of raising DIVIDE_BY_ZERO."""
    pdf = pd.DataFrame(
        {"y": [0.0, 10.0, 20.0], "yhat": [5.0, 5.0, 10.0]}
    )
    df = spark.createDataFrame(pdf)
    err = F.abs(F.col("y") - F.col("yhat"))
    out = df.agg(
        F.round(
            F.avg(err / F.nullif(F.abs(F.col("y")), F.lit(0.0))) - 1e-9, 4
        ).alias("mape")
    ).collect()
    # day with y=0 skipped: mean(5/10, 10/20) = 0.5
    assert abs(out[0].mape - 0.5) < 1e-9
