"""Bucketed range join — pure interval predicates without the
nested-loop cliff (§2.C theta/interval family, the no-equi-key case).

`l.join(r, (l.p >= r.lo) & (l.p < r.hi))` with no equality conjunct
gives Catalyst nothing to hash on: the plan is BroadcastNestedLoopJoin
(or worse, CartesianProduct) — O(|L|·|R|) comparisons, the shape that
dies first at scale.  `join_theta` keeps that plan deliberately for
bounded sides; this operator is the unbounded-sides path.

The fix is to MANUFACTURE the equi key: quantize the domain into
fixed-width buckets, tag each left point with its bucket, replicate
each right interval into every bucket it overlaps, equi-join on the
bucket id, and re-check the exact predicate post-match.  Cost:
right-side replication = ceil(span/width)+1 rows per interval, join
becomes hash/sort-merge on an integer key; comparisons only between
co-bucketed rows.  Each (point, interval) pair can only meet in the
point's single bucket, so no dedup is needed.  Pick `bucket_width` ≈
the typical interval span: replication stays ≈ 2× while bucket
population stays narrow (the same tuning rule as Databricks' range
join hint bin size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows of `left` to intervals [right_lo, right_hi) of
    `right` on containment of `left_point`, via a bucket equi key.

    The point and bound columns must be integral (cast timestamps to
    epoch micros first).  Returns all columns of both inputs.
    """
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_point) / F.lit(bucket_width))
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)),
                F.floor((F.col(right_hi) - 1) / F.lit(bucket_width)),
            )
        ),
    )
    cond: Column = (
        (lb["__bucket"] == rb["__bucket"])
        & (lb[left_point] >= rb[right_lo])
        & (lb[left_point] < rb[right_hi])
    )
    return lb.join(rb, cond, how).drop("__bucket")


def bucketed_interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
) -> DataFrame:
    """Interval×interval overlap join ([lo, hi) intersect) via the
    same bucket trick.  Unlike point-in-interval, a pair of intervals
    can co-occupy MANY buckets; emitting on every shared bucket would
    duplicate pairs, so a pair is emitted only in the bucket holding
    the overlap's START (max of the two lo values) — exactly one
    bucket per pair, no post-join dedup shuffle."""
    lb = left.withColumn(
        "__bl",
        F.explode(
            F.sequence(
                F.floor(F.col(left_lo) / F.lit(bucket_width)),
                F.floor((F.col(left_hi) - 1) / F.lit(bucket_width)),
            )
        ),
    )
    rb = right.withColumn(
        "__br",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)),
                F.floor((F.col(right_hi) - 1) / F.lit(bucket_width)),
            )
        ),
    )
    overlap_start_bucket = F.floor(
        F.greatest(lb[left_lo], rb[right_lo]) / F.lit(bucket_width)
    )
    cond = (
        (lb["__bl"] == rb["__br"])
        & (lb[left_lo] < rb[right_hi])
        & (rb[right_lo] < lb[left_hi])
        & (lb["__bl"] == overlap_start_bucket)
    )
    return lb.join(rb, cond, "inner").drop("__bl", "__br")
