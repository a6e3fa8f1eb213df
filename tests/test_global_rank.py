"""global_row_numbers == the single-task window, on every input shape.

The two-pass partition-offset ranking must produce the identical
numbering as `row_number() OVER (ORDER BY keys)` for any total-order
key chain, independent of partition-boundary sampling: skewed
distributions, tiny inputs (fewer rows than partitions, empty
partitions), and pre-shuffled input orders.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ondemand_dask_spark.operators.rank import global_row_numbers


def _check(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        (r.k, r.v): r.pos
        for r in global_row_numbers(df, "k", "v").collect()
    }
    w = Window.orderBy("k", "v")
    want = {
        (r.k, r.v): r.pos
        for r in df.withColumn("pos", F.row_number().over(w)).collect()
    }
    assert got == want


def test_skewed_keys(spark):
    rng = random.Random(5)
    rows = [(rng.choice([1, 1, 1, 1, 2, 3, 10**9]), i) for i in range(5000)]
    _check(spark, rows)


def test_tiny_input_fewer_rows_than_partitions(spark):
    _check(spark, [(3, 1), (1, 2), (2, 3)])


def test_shuffled_input_order(spark):
    rng = random.Random(9)
    rows = [(i, i * 7 % 101) for i in range(2000)]
    rng.shuffle(rows)
    _check(spark, rows)


def _check_min_ranks(spark, rows):
    from ondemand_dask_spark.operators.rank import global_min_ranks

    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        (r.k, r.v): r.rnk for r in global_min_ranks(df, "k", "v").collect()
    }
    w = Window.orderBy("k")
    want = {
        (r.k, r.v): r.rnk
        for r in df.withColumn("rnk", F.rank().over(w)).collect()
    }
    assert got == want


def test_min_ranks_with_heavy_ties(spark):
    rng = random.Random(11)
    rows = [(rng.choice([1, 1, 1, 2, 5, 5, 9]), i) for i in range(4000)]
    _check_min_ranks(spark, rows)


def test_min_ranks_all_distinct(spark):
    rows = [(i * 3 % 997, i) for i in range(997)]
    _check_min_ranks(spark, rows)


def test_min_ranks_single_value(spark):
    _check_min_ranks(spark, [(7, i) for i in range(50)])


def _check_prefix(spark, rows):
    from ondemand_dask_spark.operators.rank import global_prefix_sums

    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        (r.k, r.v): (r.pos, r.cum)
        for r in global_prefix_sums(df, "v", "k", "v").collect()
    }
    w = Window.orderBy("k", "v")
    wr = w.rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.k, r.v): (r.pos, r.cum)
        for r in df.withColumn("pos", F.row_number().over(w))
        .withColumn("cum", F.sum("v").over(wr))
        .collect()
    }
    assert got == want


def test_prefix_sums_match_global_window(spark):
    rng = random.Random(11)
    rows = [(rng.randrange(100), i) for i in range(5000)]
    _check_prefix(spark, rows)


def test_prefix_sums_tiny_and_skewed(spark):
    _check_prefix(spark, [(1, 3), (1, 1), (1, 2)])
    rng = random.Random(13)
    _check_prefix(
        spark, [(rng.choice([7, 7, 7, 9]), i) for i in range(500)]
    )


def test_prefix_sums_integer_input_stays_exact_long(spark):
    """The cross-partition offset must be typed as SUM(value)'s own
    result type: a DOUBLE zero literal used to widen an exact-integer
    running sum to DOUBLE, which loses exactness past 2^53.  Values
    around 2^53 are distinguishable in LONG but collapse in DOUBLE."""
    from pyspark.sql.types import LongType

    from ondemand_dask_spark.operators.rank import global_prefix_sums

    big = 2**53  # 2^53 and 2^53+1 are the classic double-collapse pair
    rows = [(i, big + i) for i in range(8)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = global_prefix_sums(df, "v", "k")
    assert isinstance(out.schema["cum"].dataType, LongType)
    got = {r.k: r.cum for r in out.collect()}
    want, run = {}, 0
    for k, v in rows:
        run += v
        want[k] = run
    assert got == want
