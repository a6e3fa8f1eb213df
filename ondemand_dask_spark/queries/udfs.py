"""§2.J — UDF / UDAF / UDTF surface (the reference's escape hatches).

The reference's `map_partitions` / `apply` / `groupby.apply` /
`Aggregation` / cogroup idioms map onto Spark's Arrow-batched Python
surface: `mapInPandas`, scalar `pandas_udf`, `applyInPandas`,
grouped-agg `pandas_udf`, `cogroup().applyInPandas`, and Python UDTFs.

Performance posture (SURVEY §2.J / 100 TB): all of these cross the
JVM↔Python boundary and are the SLOW path — the engine keeps them
out of benched queries, and every function here is either vectorized
over Arrow batches (pandas ops inside, never Python row loops) or
explicitly documented as row-at-a-time (UDTF).  Where the semantics
are SQL-expressible the query still carries a DuckDB oracle, making
these differential tests of the Python boundary itself (Arrow type
mapping, batch slicing, grouped shuffles) — the rest are rows-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.registry import register

_R = 4


@register(
    "udf_map_in_pandas",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) - 1e-9, {_R}) + 0.0 AS net_revenue
    FROM lineitem
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.map_partitions(f) → mapInPandas: arbitrary pandas-frame →
    pandas-frame per Arrow batch.  Narrow op — no shuffle, scales
    linearly; the cost is serialization, ~2-5× a codegen projection."""
    li = load_table(spark, sf_dir, "lineitem")

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[["l_orderkey", "l_linenumber"]].copy()
            out["net_revenue"] = (
                pdf.l_extendedprice * (1 - pdf.l_discount) - 1e-9
            ).round(_R)
            yield out

    return li.mapInPandas(
        batch, "l_orderkey bigint, l_linenumber int, net_revenue double"
    )


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT c_custkey,
           lower(c_name) || ':' || lower(c_mktsegment) AS tagged
    FROM customer
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.map / df.apply(axis=1) → scalar pandas_udf (vectorized over
    Arrow batches; ~10-100× a row-at-a-time Python UDF)."""

    @pandas_udf("string")
    def tag(name: pd.Series, seg: pd.Series) -> pd.Series:
        return name.str.lower() + ":" + seg.str.lower()

    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", tag("c_name", "c_mktsegment").alias("tagged"))


@register(
    "udf_apply_in_pandas",
    oracle=f"""
    SELECT event_id, user_id,
           round(value - avg(value) OVER (PARTITION BY user_id) - 1e-9, {_R}) + 0.0
             AS value_demeaned
    FROM events
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby(k).apply(f) → applyInPandas: full per-group pandas
    function after one shuffle on the key.  The oracle expresses the
    same semantics as a window — the differential test proves the
    grouped-shuffle + Arrow path agrees with pure SQL."""
    e = load_table(spark, sf_dir, "events")

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["event_id", "user_id"]].copy()
        out["value_demeaned"] = (pdf.value - pdf.value.mean() - 1e-9).round(_R)
        return out

    return e.groupBy("user_id").applyInPandas(
        demean, "event_id bigint, user_id bigint, value_demeaned double"
    )


@register(
    "udf_grouped_agg",
    oracle=f"""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity) - 1e-9, {_R}) + 0.0
             AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd.Aggregation(chunk, agg, finalize) → grouped-agg pandas_udf
    (Series → scalar).  Caveat vs the reference: no partial/combine
    stage — the whole group ships to one Python worker; fine for
    bounded groups, use built-in partial aggs for unbounded ones."""

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return round(float(np.average(price, weights=qty)) - 1e-9, _R)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wavg("l_extendedprice", "l_quantity").alias("wavg_price")
    )


@register(
    "udf_cogroup",
    oracle=f"""
    WITH c AS (
      SELECT user_id, count(*) AS n_clicks,
             round(sum(value) - 1e-9, {_R}) + 0.0 AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
      SELECT user_id, count(*) AS n_purchases,
             round(sum(value) - 1e-9, {_R}) + 0.0 AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(n_clicks, 0)       AS n_clicks,
           coalesce(n_purchases, 0)    AS n_purchases,
           coalesce(click_value, 0.0)  AS click_value,
           coalesce(purchase_value, 0.0) AS purchase_value
    FROM c FULL JOIN p ON c.user_id = p.user_id
    """,
)
def udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-frame cogroup → cogroup().applyInPandas: both sides
    shuffled on the key once, the Python function sees the pair of
    per-key frames (either possibly empty)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")

    def summarize(key: tuple, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_clicks": [len(l)],
                "n_purchases": [len(r)],
                "click_value": [round(float(l.value.sum()) - 1e-9, _R)],
                "purchase_value": [round(float(r.value.sum()) - 1e-9, _R)],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            summarize,
            "user_id bigint, n_clicks bigint, n_purchases bigint, "
            "click_value double, purchase_value double",
        )
    )


@register(
    "udf_table_function",
    oracle="""
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i + 1])) AS bigram
    FROM (SELECT doc_id, string_split(text, ' ') AS t
          FROM documents WHERE doc_id < 50)
    """,
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator apply → Python UDTF (Spark ≥ 3.5): one input row →
    many output rows (text bigrams).  Row-at-a-time execution — demo
    of the surface; the vectorized equivalent is the pure-SQL
    transform the oracle uses (see text_shingles in §2.K for the
    codegen version)."""

    @udtf(returnType="doc_id bigint, bigram string")
    class Bigrams:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            for a, b in zip(toks, toks[1:]):
                yield doc_id, f"{a} {b}"

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    spark.udtf.register("bigrams_udtf", Bigrams)
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT b.doc_id, b.bigram "
        "FROM __udtf_docs d, LATERAL bigrams_udtf(d.doc_id, d.text) b"
    )


@register(
    "udf_ewm",
    oracle=None,
    scale_class="certificate",  # pandas' exact unbounded float
    # recursion, sequential per key — the verification reference for
    # the bounded-window production form (its twin), not a 100 TB
    # path.
    twin="window_ewm_bounded",
)
def udf_ewm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.ewm(alpha).mean() — recursive smoothing has no closed-form
    SQL window; per-key applyInPandas with pandas' exact ewm inside
    (rows-only check per SURVEY §2.E)."""
    e = load_table(spark, sf_dir, "events")

    def ewm_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        out = pdf[["event_id", "user_id"]].copy()
        out["ewm_value"] = pdf.value.ewm(alpha=0.3, adjust=True).mean().round(_R)
        return out

    return e.groupBy("user_id").applyInPandas(
        ewm_fn, "event_id bigint, user_id bigint, ewm_value double"
    )


@register(
    "udf_map_overlap",
    oracle=f"""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) - 1e-9,
                 {_R}) AS smoothed
    FROM events
    """,
)
def udf_map_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.map_overlap(f, before=2) — ghost-row windowed partition map.
    Spark needs no ghost-row machinery: the same semantics is a
    bounded-frame window (shuffle on key + per-partition sort), which
    is also how the engine implements it — `map_overlap` exists in
    the reference only because its partitions are physical."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w) - 1e-9, _R).alias("smoothed"),
    )


@register(
    "udf_map_in_arrow",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax) - 1e-9, {_R}) + 0.0
             AS charge
    FROM lineitem
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy tier below mapInPandas: batches
    arrive as pyarrow RecordBatch, no pandas materialization, so
    columnar libs (arrow compute here; at 100 TB think tokenizers /
    image decoders with arrow bindings) run without the
    arrow→pandas→arrow double conversion."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = load_table(spark, sf_dir, "lineitem")

    def batches(it):
        for b in it:
            charge = pc.multiply(
                pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                ),
                pc.add(pa.scalar(1.0), b.column("l_tax")),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("l_orderkey"),
                    b.column("l_linenumber"),
                    pc.round(pc.subtract(charge, pa.scalar(1e-9)), ndigits=_R),
                ],
                names=["l_orderkey", "l_linenumber", "charge"],
            )

    return li.mapInArrow(
        batches, "l_orderkey bigint, l_linenumber int, charge double"
    )
