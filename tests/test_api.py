"""Differential tests for the Dask-style façade (operators/frame.py)
and the merge_asof operator — checked against pandas, the semantics
the reference's users actually hold (oracle queries cover the SQL
side; these cover the ported-code side)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.operators import OnDemandFrame, from_spark, merge_asof
from tests.compare import assert_results_match


@pytest.fixture(scope="module")
def events(spark, sf_dir) -> OnDemandFrame:
    return from_spark(load_table(spark, sf_dir, "events"))


@pytest.fixture(scope="module")
def events_pd(events) -> pd.DataFrame:
    return events.compute()


@pytest.fixture(scope="module")
def customer(spark, sf_dir) -> OnDemandFrame:
    return from_spark(load_table(spark, sf_dir, "customer"))


def test_projection_mask_assign(events, events_pd):
    got = (
        events[["event_id", "user_id", "value"]][events["value"] > 50]
        .assign(value_k=lambda f: f["value"] / 1000)
        .compute()
    )
    exp = events_pd[events_pd.value > 50][["event_id", "user_id", "value"]].assign(
        value_k=lambda d: d.value / 1000
    )
    assert_results_match(got, exp, "projection_mask_assign")


def test_query_rename_astype(events, events_pd):
    got = (
        events.query("event_type = 'click' and value > 10")
        .rename({"value": "v"})
        .astype({"user_id": "int"})[["event_id", "user_id", "v"]]
        .compute()
    )
    exp = (
        events_pd.query("event_type == 'click' and value > 10")
        .rename(columns={"value": "v"})
        .astype({"user_id": "int32"})[["event_id", "user_id", "v"]]
    )
    assert_results_match(got, exp, "query_rename_astype")


def test_merge_indicator(events, customer):
    got = (
        events[["event_id", "user_id"]]
        .rename({"user_id": "c_custkey"})
        .merge(customer[["c_custkey", "c_mktsegment"]], on="c_custkey",
               how="outer", indicator=True)
        .compute()
    )
    exp = pd.merge(
        events.compute()[["event_id", "user_id"]].rename(
            columns={"user_id": "c_custkey"}
        ),
        customer.compute()[["c_custkey", "c_mktsegment"]],
        on="c_custkey",
        how="outer",
        indicator=True,
    )
    exp["_merge"] = exp["_merge"].astype(str)
    assert_results_match(got, exp, "merge_indicator")


def test_groupby_agg_spec(events, events_pd):
    got = events.groupby("event_type").agg(
        {"value": ["sum", "mean", "max"], "user_id": "nunique"}
    ).compute()
    exp = events_pd.groupby("event_type").agg(
        value_sum=("value", "sum"),
        value_mean=("value", "mean"),
        value_max=("value", "max"),
        user_id_nunique=("user_id", "nunique"),
    ).reset_index()
    assert_results_match(got, exp, "groupby_agg_spec")


def test_groupby_size_and_transform(events, events_pd, spark):
    got = events.groupby("user_id").size().compute()
    exp = events_pd.groupby("user_id").size().rename("size").reset_index()
    assert_results_match(got, exp, "groupby_size")

    gb = events.groupby("user_id")
    got2 = (
        events.assign(user_mean=gb.transform("value", "mean"))[
            ["event_id", "user_mean"]
        ].compute()
    )
    exp2 = pd.DataFrame(
        {
            "event_id": events_pd.event_id,
            "user_mean": events_pd.groupby("user_id").value.transform("mean"),
        }
    )
    assert_results_match(got2, exp2, "groupby_transform")


def test_drop_duplicates_keep_first(events, events_pd):
    got = events.drop_duplicates(
        subset=["user_id", "event_type"], keep_order=[F.asc("ts"), F.asc("event_id")]
    )[["user_id", "event_type", "event_id"]].compute()
    exp = (
        events_pd.sort_values(["ts", "event_id"])
        .drop_duplicates(subset=["user_id", "event_type"], keep="first")[
            ["user_id", "event_type", "event_id"]
        ]
    )
    assert_results_match(got, exp, "drop_duplicates_keep_first")


def test_value_counts_nlargest(events, events_pd):
    got = events.value_counts("event_type").compute()
    exp = (
        events_pd.event_type.value_counts()
        .rename_axis("event_type")
        .rename("count")
        .reset_index()
    )
    assert_results_match(got, exp, "value_counts")

    got2 = events.nlargest(5, "value")[["event_id", "value"]].compute()
    exp2 = events_pd.nlargest(5, "value")[["event_id", "value"]]
    assert_results_match(got2, exp2, "nlargest")


def test_rolling_mean(events, events_pd):
    roll = events.rolling(3, order_by=["ts", "event_id"], partition_by=["user_id"])
    got = events.assign(r=roll.mean("value"))[["event_id", "r"]].compute()
    exp_s = (
        events_pd.sort_values(["ts", "event_id"])
        .groupby("user_id")
        .value.rolling(3, min_periods=1)
        .mean()
        .reset_index(level=0, drop=True)
    )
    exp = pd.DataFrame({"event_id": events_pd.event_id, "r": exp_s})
    assert_results_match(got, exp, "rolling_mean")


def _asof_frames(events):
    left = events[["user_id", "ts", "event_id"]]
    right = events.query("event_type = 'purchase'")[
        ["user_id", "ts", "event_id", "value"]
    ]
    lpd = left.compute().sort_values("ts", kind="stable")
    rpd = right.compute().sort_values("ts", kind="stable")
    return left, right, lpd, rpd


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_merge_asof_directions(events, direction):
    left, right, lpd, rpd = _asof_frames(events)
    got = (
        merge_asof(
            left.to_spark(), right.to_spark(), on="ts", by="user_id",
            direction=direction, suffix="_p",
        )
        .select("event_id", "user_id", "event_id_p", "value_p")
        .toPandas()
    )
    exp = pd.merge_asof(
        lpd, rpd, on="ts", by="user_id", direction=direction,
        suffixes=("", "_p"),
    ).rename(columns={"value": "value_p"})[  # only clashing cols get suffixed
        ["event_id", "user_id", "event_id_p", "value_p"]
    ]
    assert_results_match(got, exp, f"merge_asof_{direction}")


def test_merge_asof_tolerance(events):
    left, right, lpd, rpd = _asof_frames(events)
    got = (
        merge_asof(
            left.to_spark(), right.to_spark(), on="ts", by="user_id",
            direction="backward", tolerance_seconds=3600, suffix="_p",
        )
        .select("event_id", "event_id_p")
        .toPandas()
    )
    exp = pd.merge_asof(
        lpd, rpd, on="ts", by="user_id", direction="backward",
        tolerance=pd.Timedelta(hours=1), suffixes=("", "_p"),
    )[["event_id", "event_id_p"]]
    assert_results_match(got, exp, "merge_asof_tolerance")


def test_melt_pivot(events):
    small = events[["event_id", "user_id", "value"]].assign(
        value2=lambda f: f["value"] * 2
    )
    melted = small.melt(id_vars=["event_id"], value_vars=["value", "value2"])
    assert melted.compute().shape[0] == 2 * small.compute().shape[0]

    pv = events.pivot_table(
        index="user_id", columns="event_type", values="value", aggfunc="sum"
    ).compute()
    assert "purchase" in pv.columns


def test_set_index_layout(events):
    idx = events.set_index("ts", npartitions=4)
    sdf = idx.to_spark()
    assert sdf.rdd.getNumPartitions() == 4
    # within-partition sortedness
    from pyspark.sql import functions as F  # noqa: F811

    part = sdf.withColumn("p", F.spark_partition_id())
    bad = (
        part.groupBy("p")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .orderBy("p")
        .toPandas()
    )
    # range partitions must not overlap
    assert all(bad.hi.iloc[i] <= bad.lo.iloc[i + 1] for i in range(len(bad) - 1))


def test_where_replace_sample(events, events_pd):
    got = (
        events[["event_id", "value"]]
        .where(events["value"] > 100, -1.0)
        .compute()
    )
    import numpy as np

    exp = pd.DataFrame(
        {
            "event_id": np.where(events_pd.value > 100, events_pd.event_id, -1.0),
            "value": np.where(events_pd.value > 100, events_pd.value, -1.0),
        }
    )
    assert_results_match(got, exp, "where_other")

    s = events.sample(0.3, random_state=7)
    n = s.compute().shape[0]
    assert 0 < n < events_pd.shape[0]
    # seeded → reproducible
    assert events.sample(0.3, random_state=7).compute().shape[0] == n


def test_concat_and_isin(events, events_pd):
    a = events.query("event_type = 'click'")[["event_id", "value"]]
    b = events.query("event_type = 'error'")[["event_id"]]
    both = a.concat(b).compute()
    n_click = (events_pd.event_type == "click").sum()
    n_error = (events_pd.event_type == "error").sum()
    assert both.shape[0] == n_click + n_error
    assert both.value.isna().sum() == n_error  # missing col NULL-filled

    f = events.isin_filter("event_type", ["click", "view"]).compute()
    assert f.shape[0] == events_pd.event_type.isin(["click", "view"]).sum()


def test_map_partitions_and_head_tail(events, events_pd):
    def double(it):
        for pdf in it:
            out = pdf[["event_id"]].copy()
            out["v2"] = pdf.value * 2
            yield out

    got = events.map_partitions(double, "event_id bigint, v2 double").compute()
    exp = pd.DataFrame({"event_id": events_pd.event_id, "v2": events_pd.value * 2})
    assert_results_match(got, exp, "map_partitions")

    assert events.head(7).shape[0] == 7
    t = events.sort_values("event_id").tail(3)
    assert list(t.event_id) == sorted(events_pd.event_id)[-3:]


def test_facade_merge_asof(events):
    left = events[["user_id", "ts", "event_id"]]
    right = events.query("event_type = 'purchase'")[["user_id", "ts", "value"]]
    out = left.merge_asof(right, on="ts", by="user_id", suffix="_p").compute()
    assert "value_p" in out.columns and out.shape[0] == left.compute().shape[0]


def test_ffill_bfill_pct_change(events, events_pd):
    """ffill/bfill/pct_change vs pandas groupby.transform."""
    gappy = events.assign(
        v=F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
            F.col("value")
        )
    )
    got = (
        gappy.assign(
            ff=gappy.ffill("v", ["ts", "event_id"], ["user_id"]),
            bf=gappy.bfill("v", ["ts", "event_id"], ["user_id"]),
            pc=gappy.pct_change("value", ["ts", "event_id"], ["user_id"]),
        )[["event_id", "ff", "bf", "pc"]]
        .compute()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    pdf = events_pd.sort_values(["ts", "event_id"]).copy()
    pdf["v"] = pdf["value"].where(pdf["event_id"] % 5 != 0)
    g = pdf.groupby("user_id")
    pdf["ff"] = g["v"].ffill()
    pdf["bf"] = g["v"].bfill()
    pdf["pc"] = g["value"].transform(lambda s: s.pct_change())
    exp = pdf[["event_id", "ff", "bf", "pc"]].sort_values("event_id").reset_index(
        drop=True
    )
    assert_results_match(got, exp, "ffill_bfill_pct_change")


def test_expanding_cumsum(events, events_pd):
    exp_w = events.expanding(order_by=["ts", "event_id"], partition_by=["user_id"])
    got = events.assign(cs=exp_w.sum("value"))[["event_id", "cs"]].compute()
    exp_s = (
        events_pd.sort_values(["ts", "event_id"])
        .groupby("user_id")
        .value.cumsum()
    )
    exp = pd.DataFrame({"event_id": events_pd.event_id, "cs": exp_s})
    assert_results_match(got, exp, "expanding_cumsum")


def test_resample_day_agg(events, events_pd):
    got = events.resample("1D", on="ts").agg({"value": "sum"}).compute()
    exp = (
        events_pd.set_index("ts")
        .resample("1D")["value"]
        .sum(min_count=1)
        .dropna()
        .rename("value_sum")
        .reset_index()
    )
    assert_results_match(got, exp, "resample_day_agg")


def test_nunique_explode_cov_corr(events, events_pd):
    assert (
        events.nunique("event_type").compute().iloc[0, 0]
        == events_pd.event_type.nunique()
    )
    arr = events.assign(a=F.array(F.lit(1), F.lit(2)))[["event_id", "a"]]
    got = arr.explode("a").compute()
    assert len(got) == 2 * len(events_pd)
    cov = events.cov("value", "event_id").compute().iloc[0, 0]
    exp_cov = events_pd.value.cov(events_pd.event_id.astype("float64"))
    assert abs(cov - exp_cov) / abs(exp_cov) < 1e-9
    corr = events.corr("value", "event_id").compute().iloc[0, 0]
    exp_corr = events_pd.value.corr(events_pd.event_id.astype("float64"))
    assert abs(corr - exp_corr) < 1e-9


def test_quantile_monotone(events, events_pd):
    row = events.quantile("value", [0.25, 0.5, 0.75]).compute().iloc[0]
    q25, q50, q75 = row["value_q0_25"], row["value_q0_5"], row["value_q0_75"]
    assert q25 <= q50 <= q75
    # sketch answers are actual data values within the hull, close to
    # pandas' interpolated quantiles at this accuracy
    for got, q in ((q25, 0.25), (q50, 0.5), (q75, 0.75)):
        exp = events_pd.value.quantile(q)
        assert abs(got - exp) <= abs(exp) * 0.05 + 1.0


def test_merge_suffixes_and_left_right_on(events, events_pd):
    # self-merge on user_id: value/ts/event_type clash -> suffixed
    small = events[["user_id", "event_id", "value"]]
    agg = small.groupby("user_id").agg({"value": "max"}).rename(
        {"value_max": "value"}
    )
    got = small.merge(agg, on="user_id", how="inner").compute()
    exp = events_pd[["user_id", "event_id", "value"]].merge(
        events_pd.groupby("user_id", as_index=False)["value"]
        .max(),
        on="user_id",
        how="inner",
        suffixes=("_x", "_y"),
    )
    assert_results_match(got, exp, "merge_suffixes")

    # left_on/right_on with different key names keeps both keys
    renamed = agg.rename({"user_id": "uid"})
    got2 = small.merge(
        renamed, left_on="user_id", right_on="uid", how="inner"
    ).compute()
    exp2 = events_pd[["user_id", "event_id", "value"]].merge(
        events_pd.groupby("user_id", as_index=False)["value"]
        .max()
        .rename(columns={"user_id": "uid"}),
        left_on="user_id",
        right_on="uid",
        how="inner",
        suffixes=("_x", "_y"),
    )
    assert_results_match(got2, exp2, "merge_left_right_on")


def test_clip_round_unique_between(events, events_pd):
    got = (
        events.clip(["value"], lower=10.0, upper=100.0)
        .round({"value": 1})
        .compute()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = events_pd.copy()
    exp["value"] = exp["value"].clip(10.0, 100.0).round(1)
    exp = exp.sort_values("event_id").reset_index(drop=True)
    # Spark rounds HALF_UP, pandas rounds half-even: exactly-.x5
    # values differ by one last digit — allow that single-ulp gap,
    # and require exact match off the tie.
    assert (got["value"].isna() == exp["value"].isna()).all()
    diff = (got["value"] - exp["value"]).abs().fillna(0.0)
    # a half-up vs half-even disagreement at an exact .x5 tie moves
    # the LAST KEPT DIGIT by one (0.1 here); nothing else may differ
    assert (diff <= 0.1 + 1e-9).all()
    raw = events_pd.sort_values("event_id").reset_index(drop=True)[
        "value"
    ].clip(10.0, 100.0)
    ties = ((raw * 100) % 10).sub(5).abs() < 1e-6
    assert (diff[~ties] <= 1e-9).all()  # exact off the tie

    got_u = set(events.unique("event_type").compute()["event_type"])
    assert got_u == set(events_pd["event_type"].unique())

    got_b = events.between_filter("value", 20.0, 50.0).compute()
    exp_b = events_pd[events_pd.value.between(20.0, 50.0)]
    assert len(got_b) == len(exp_b)


def test_rank_min_and_dense(customer):
    cpd = customer.compute()
    got = (
        customer.assign(r=lambda f: f.rank("c_acctbal", method="min"))
        .compute()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    exp = cpd.assign(r=cpd["c_acctbal"].rank(method="min").astype("int64"))
    exp = exp.sort_values("c_custkey").reset_index(drop=True)
    assert (got["r"].astype("int64") == exp["r"]).all()

    got_d = (
        customer.assign(r=lambda f: f.rank("c_acctbal", method="dense"))
        .compute()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    exp_d = cpd.assign(r=cpd["c_acctbal"].rank(method="dense").astype("int64"))
    exp_d = exp_d.sort_values("c_custkey").reset_index(drop=True)
    assert (got_d["r"].astype("int64") == exp_d["r"]).all()


def test_clip_preserves_nulls(spark):
    """pandas df.clip keeps NaN as NaN; Spark greatest/least skip
    nulls, so an unguarded clip would turn NULL into the bound."""
    pdf = pd.DataFrame({"k": [1, 2, 3, 4], "v": [5.0, None, 250.0, -3.0]})
    f = from_spark(spark.createDataFrame(pdf))
    got = (
        f.clip(["v"], lower=0.0, upper=100.0)
        .compute()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = pdf.copy()
    exp["v"] = exp["v"].clip(0.0, 100.0)
    exp = exp.sort_values("k").reset_index(drop=True)
    assert got["v"].isna().tolist() == exp["v"].isna().tolist()
    mask = ~exp["v"].isna()
    assert (got["v"][mask] == exp["v"][mask]).all()
