"""Bucketed co-located join — the persistent form of Dask's
"aligned divisions" merge (SURVEY §2.C row 'index-aligned join').

Both tables are written `bucketBy(8, join_key)` + sorted; a
subsequent join on the bucket keys must plan WITHOUT any Exchange:
rows are already co-partitioned on disk, so at 100 TB the join reads
bucket i of each side on the same executor and merges — the layout
you bake once for a fact table that is joined on the same key daily.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.plans import shuffle_count, sort_merge_join_count


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        customer.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("b_customer")
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(lt).join(
            spark.table(rt), F.col("o_custkey") == F.col("c_custkey")
        )
        assert shuffle_count(j) == 0, "bucketed join must not re-shuffle"
        assert sort_merge_join_count(j) == 1
        # and it still answers correctly
        plain = load_table_join(spark)
        assert j.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def load_table_join(spark) -> int:
    return (
        spark.table("b_orders")
        .join(
            F.broadcast(spark.table("b_customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )


def test_unbucketed_same_join_does_shuffle(spark, sf_dir):
    """Control: the identical join on plain parquet needs exchanges
    (proves the zero above comes from the bucketed layout)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer")
        j = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        assert shuffle_count(j) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
