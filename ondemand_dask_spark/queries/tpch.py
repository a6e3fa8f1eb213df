"""Golden end-to-end queries (SURVEY.md §5.2.2) — TPC-H-derived
multi-operator queries over the star schema.  These exercise the
engine's spine (scan → filter → project → partial/final agg → join →
sort → top-k) and catch composition bugs that single-operator tests
miss.

Scale notes (100 TB posture):
- q1: single scan + hash agg; filter and the 7-column projection push
  to the parquet scan; partial agg map-side means the shuffle carries
  only |groups| x partitions rows.
- q3/q5: fact-fact joins shuffle on their keys (sort-merge under AQE);
  dimension joins (region/nation/customer at bounded cardinality)
  broadcast — `F.broadcast` on the provably small sides, AQE converts
  the rest when runtime stats allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.registry import register

# Floating aggregates are rounded identically on both engines so the
# order-insensitive value-hash is robust to summation order.
_R = 4


@register(
    "tpch_q1",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      round((sum(l_quantity)) - 1e-9, {_R})                                        AS sum_qty,
      round((sum(l_extendedprice)) - 1e-9, {_R})                                   AS sum_base_price,
      round((sum(l_extendedprice * (1 - l_discount))) - 1e-9, {_R})                AS sum_disc_price,
      round((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) - 1e-9, {_R}) AS sum_charge,
      round((avg(l_quantity)) - 1e-9, {_R})                                        AS avg_qty,
      round((avg(l_extendedprice)) - 1e-9, {_R})                                   AS avg_price,
      round((avg(l_discount)) - 1e-9, {_R})                                        AS avg_disc,
      count(*)                                                            AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: filter → 2-key groupBy → 5 decomposable aggs."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round((F.sum("l_quantity")) - 1e-9, _R).alias("sum_qty"),
            F.round((F.sum("l_extendedprice")) - 1e-9, _R).alias("sum_base_price"),
            F.round((F.sum(disc_price)) - 1e-9, _R).alias("sum_disc_price"),
            F.round((F.sum(charge)) - 1e-9, _R).alias("sum_charge"),
            F.round((F.avg("l_quantity")) - 1e-9, _R).alias("avg_qty"),
            F.round((F.avg("l_extendedprice")) - 1e-9, _R).alias("avg_price"),
            F.round((F.avg("l_discount")) - 1e-9, _R).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    oracle=f"""
    SELECT
      l_orderkey,
      round((sum(l_extendedprice * (1 - l_discount))) - 1e-9, {_R}) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: 3-way join + agg + deterministic top-10."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is the small side at every SF → broadcast
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) - 1e-9, _R
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle=f"""
    SELECT
      n_name,
      round((sum(l_extendedprice * (1 - l_discount))) - 1e-9, {_R}) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join, dims broadcast, 1-key agg."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) - 1e-9, _R
            ).alias("revenue")
        )
    )


@register(
    "tpch_q6",
    oracle=f"""
    SELECT round((sum(l_extendedprice * l_discount)) - 1e-9, {_R}) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change: pure scan+filter+global agg; every
    predicate pushes to the parquet row-group stats."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round((F.sum(F.col("l_extendedprice") * F.col("l_discount"))) - 1e-9, _R).alias(
                "revenue"
            )
        )
    )
