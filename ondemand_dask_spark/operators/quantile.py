"""Distributed EXACT grouped quantiles (§2.D).

`F.percentile` (and any ObjectHashAggregate) collects every group
value into one aggregation buffer — at 100 TB a low-cardinality
groupBy means multi-GB buffers on single tasks: the OOM shape.  This
operator computes the same linearly-interpolated quantile
(`quantile_cont` semantics: value at rank h = (n-1)·q, interpolating
between floor(h) and ceil(h)) through a distributed SORT instead:

  1. window rank over (keys, value) — a range-partitioned sort, the
     same machinery as orderBy, no per-task value collection;
  2. keep only the (at most 2·|qs|) boundary rows per group via
     conditional aggregation;
  3. interpolate post-aggregation.

Cost: one sort shuffle of the input vs one collect-everything agg;
memory per task is O(1).  Exactness is bit-identical to
`quantile_cont` — differentially proven by the `agg_groupby_quantile`
oracle query which runs on this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_group_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    qs: dict[str, float],
) -> DataFrame:
    """One row per group with a column per requested quantile.

    qs: output_column_name -> quantile in [0, 1].
    """
    # rank over the normalized __v column (ties get arbitrary ranks —
    # harmless: interpolating between equal values returns that value)
    w_sort = Window.partitionBy(*keys).orderBy("__v")
    w_all = Window.partitionBy(*keys)
    d = (
        df.select(*keys, F.col(col).cast("double").alias("__v"))
        .withColumn("__rn", F.row_number().over(w_sort) - 1)  # 0-based rank
        .withColumn("__n", F.count("*").over(w_all))
    )
    aggs = [F.max("__n").alias("__n")]
    for name, q in qs.items():
        h = (F.col("__n") - 1) * F.lit(float(q))
        aggs.append(
            F.max(F.when(F.col("__rn") == F.floor(h), F.col("__v"))).alias(
                f"__lo_{name}"
            )
        )
        aggs.append(
            F.max(F.when(F.col("__rn") == F.ceil(h), F.col("__v"))).alias(
                f"__hi_{name}"
            )
        )
    grouped = d.groupBy(*keys).agg(*aggs)
    outs = []
    for name, q in qs.items():
        h = (F.col("__n") - 1) * F.lit(float(q))
        frac = h - F.floor(h)
        lo, hi = F.col(f"__lo_{name}"), F.col(f"__hi_{name}")
        outs.append((lo + frac * (hi - lo)).alias(name))
    return grouped.select(*keys, *outs)
