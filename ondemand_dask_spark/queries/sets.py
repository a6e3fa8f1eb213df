"""§2.G — set operations.

Dask spells all of these as concat/merge idioms; Spark has native
set operators (union/intersect/except with ALL variants), which keep
multiset semantics and let Catalyst push work below the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.registry import register


@register(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 300000
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd.concat(axis=0) — union-all by column name (duplicates kept)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 300000).select("o_orderkey", "o_totalprice")
    b = o.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 300000)
    ).select("o_orderkey", "o_totalprice")
    return a.unionByName(b)


@register(
    "set_union_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      WHERE o_totalprice > 400000
    UNION ALL BY NAME
    SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderstatus = 'O' AND o_totalprice > 400000
    """,
)
def set_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd.concat with schema union — the second input lacks a column,
    which comes back NULL-filled (`allowMissingColumns`): the pattern
    for appending old-schema partitions to an evolved table."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    b = o.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 400000)
    ).select("o_orderkey", "o_totalprice")
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat + drop_duplicates — set union."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inner-merge-on-all-columns idiom — native intersect."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge(indicator) left_only idiom — native except (distinct)."""
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return n.subtract(s)


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_orderpriority FROM orders WHERE o_totalprice > 250000
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection — keeps min(count_l, count_r) copies."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 250000).select("o_orderpriority")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
    SELECT o_orderpriority FROM orders WHERE o_totalprice > 250000
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference — keeps count_l - count_r copies."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 250000).select("o_orderpriority")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return a.exceptAll(b)
