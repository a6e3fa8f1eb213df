"""Salted aggregation / join must be result-identical to the plain
forms (salting re-routes rows, never changes semantics), and the
salted agg plan must show the two-phase shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.operators.skew import salted_agg, salted_join
from ondemand_dask_spark.plans import shuffle_count
from tests.compare import assert_results_match


def test_salted_agg_matches_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    got = salted_agg(
        e,
        keys=["event_type"],
        aggs={
            "n": ("count", "event_id"),
            "total": ("sum", "value"),
            "vmin": ("min", "value"),
            "vmax": ("max", "value"),
        },
        buckets=16,
    ).withColumn("total", F.round("total", 4))
    exp = (
        e.groupBy("event_type")
        .agg(
            F.count("event_id").alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )
    assert_results_match(got.toPandas(), exp.toPandas(), "salted_agg")


def test_salted_agg_is_two_phase(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    df = salted_agg(e, ["event_type"], {"n": ("count", "event_id")}, buckets=8)
    assert shuffle_count(df) == 2  # partial (key,salt) + final (key)


def test_salted_join_matches_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("c_custkey"), "value"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    got = salted_join(e, c, on="c_custkey", buckets=4)
    exp = e.join(c, "c_custkey")
    assert got.count() == exp.count()
    assert_results_match(
        got.select("event_id", "c_mktsegment").toPandas(),
        exp.select("event_id", "c_mktsegment").toPandas(),
        "salted_join",
    )


def test_salted_agg_rejects_nondecomposable(spark, sf_dir):
    import pytest

    e = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        salted_agg(e, ["event_type"], {"m": ("median", "value")})
