"""Data-layout / lakehouse-optimization operators.

At 100 TB the dominant query cost is often not compute but HOW MUCH
of the lake a scan has to touch.  These operators compute the layout
artifacts an optimizer or table service needs: Z-order (Morton)
clustering keys for multi-dimensional locality, and zone-map
(per-file min/max) skipping statistics that quantify how much a
predicate can prune under the current layout.  Both are pure
DataFrame plans — a layout service would run them as table-mainten-
ance jobs and write the results back as file-level metadata.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.registry import register

_R = 4

_ZBITS = 8  # bits per dimension → 16-bit Morton code, 65 536 blocks


def _interleave_sql(xcol: str, ycol: str) -> str:
    """DuckDB expression: bit-interleave two _ZBITS-bit ints."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


@register(
    "layout_zorder_key",
    oracle=f"""
    WITH q AS (
      SELECT o_orderkey,
             CAST(floor(o_custkey % 256) AS BIGINT) AS qx,
             CAST(floor(epoch(o_orderdate) / 86400) % 256 AS BIGINT) AS qy
      FROM orders
    ),
    z AS (
      SELECT o_orderkey, qx, qy,
             CAST({_interleave_sql("qx", "qy")} AS BIGINT) AS zkey
      FROM q
    )
    SELECT zkey // 256 AS zblock, count(*) AS n_rows,
           min(qx) AS min_cust_bucket, max(qx) AS max_cust_bucket,
           min(qy) AS min_day_bucket, max(qy) AS max_day_bucket
    FROM z GROUP BY zblock
    """,
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two dimensions —
    customer bucket × day bucket — plus per-Z-block zone-map stats.
    Interleaving the quantized dimensions' bits gives a 1-D sort key
    whose contiguous ranges are 2-D-local, so files written in zkey
    order carry TIGHT min/max on BOTH columns and a predicate on
    either dimension prunes ~sqrt instead of nothing.  The
    interleave is {_ZBITS * 2}-bit pure codegen arithmetic (no UDF);
    the block census is one partial-agg groupBy.  A real compaction
    job would `repartitionByRange(zkey)` and write — the key
    computed here IS that job's sort column."""
    o = load_table(spark, sf_dir, "orders")
    q = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).cast("long").alias("qx"),
        (
            F.floor(
                F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
                / 86400
            )
            % 256
        ).cast("long").alias("qy"),
    )
    zkey = functools.reduce(
        operator.add,
        [
            F.shiftleft(F.shiftright("qx", i).bitwiseAND(F.lit(1)), 2 * i + 1)
            for i in range(_ZBITS)
        ]
        + [
            F.shiftleft(F.shiftright("qy", i).bitwiseAND(F.lit(1)), 2 * i)
            for i in range(_ZBITS)
        ],
    ).cast("long")
    z = q.select("o_orderkey", "qx", "qy", zkey.alias("zkey"))
    return (
        z.groupBy(F.floor(F.col("zkey") / 256).cast("long").alias("zblock"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("qx").alias("min_cust_bucket"),
            F.max("qx").alias("max_cust_bucket"),
            F.min("qy").alias("min_day_bucket"),
            F.max("qy").alias("max_day_bucket"),
        )
    )


_SKIP_FILE_ROWS = 2048  # rows per simulated file (orderkey-contiguous)
_SKIP_LO = "1995-01-01"
_SKIP_HI = "1995-06-30"


@register(
    "layout_file_skipping_stats",
    oracle=f"""
    WITH fm AS (
      SELECT layout, file_id, count(*) AS n_rows,
             min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
      FROM (
        SELECT 'ingest_order' AS layout,
               l_orderkey // {_SKIP_FILE_ROWS} AS file_id, l_shipdate
        FROM lineitem
        UNION ALL
        SELECT 'date_partitioned',
               CAST(extract(year FROM l_shipdate) * 12
                    + extract(month FROM l_shipdate) AS BIGINT),
               l_shipdate
        FROM lineitem
      ) GROUP BY layout, file_id
    ),
    cls AS (
      SELECT layout, n_rows,
             CASE WHEN max_ship < TIMESTAMP '{_SKIP_LO}'
                    OR min_ship > TIMESTAMP '{_SKIP_HI}'
                  THEN 'skipped' ELSE 'scanned' END AS file_class
      FROM fm
    )
    SELECT layout, file_class, count(*) AS n_files,
           CAST(sum(n_rows) AS BIGINT) AS total_rows
    FROM cls GROUP BY layout, file_class
    """,
)
def layout_file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map effectiveness report comparing TWO physical layouts
    of the same fact table for a date-range predicate: the
    sequential-ingest layout (orderkey-contiguous files of
    {_SKIP_FILE_ROWS} keys — shipdate is uncorrelated with insert
    order, so every file's zone map spans the full range and nothing
    prunes) versus a date-partitioned layout (one file per ship
    month — zone maps are trivially tight and whole months outside
    the predicate drop at planning time).  This is precisely the
    pruning arithmetic a lakehouse format (parquet row-group stats,
    Delta/Iceberg file stats) applies — run as a query, it
    quantifies BEFORE a re-layout how much a predicate would gain.
    One groupBy to the per-(layout, file) grain (partial aggs do the
    heavy lifting map-side), then a vocabulary-sized classification
    — scan-bound at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    ingest = li.select(
        F.lit("ingest_order").alias("layout"),
        F.floor(F.col("l_orderkey") / _SKIP_FILE_ROWS)
        .cast("long")
        .alias("file_id"),
        "l_shipdate",
    )
    dated = li.select(
        F.lit("date_partitioned").alias("layout"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("long")
        .alias("file_id"),
        "l_shipdate",
    )
    fm = ingest.unionByName(dated).groupBy("layout", "file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    lo = F.lit(_SKIP_LO).cast("timestamp")
    hi = F.lit(_SKIP_HI).cast("timestamp")
    cls = fm.select(
        "layout",
        "n_rows",
        F.when(
            (F.col("max_ship") < lo) | (F.col("min_ship") > hi), "skipped"
        )
        .otherwise("scanned")
        .alias("file_class"),
    )
    return cls.groupBy("layout", "file_class").agg(
        F.count("*").alias("n_files"), F.sum("n_rows").alias("total_rows")
    )


_COMPACT_TARGET = 2000  # rows per compacted output file


@register(
    "layout_compaction_planner",
    oracle=f"""
    WITH files AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             count(*) AS n_rows
      FROM orders GROUP BY 1
    ),
    packed AS (
      SELECT d, n_rows,
             coalesce(sum(n_rows) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM files
    )
    SELECT CAST(before // {_COMPACT_TARGET} AS BIGINT) AS bin_id,
           count(*) AS n_files,
           CAST(sum(n_rows) AS BIGINT) AS total_rows,
           CAST(min(d) AS TIMESTAMP) AS first_day,
           CAST(max(d) AS TIMESTAMP) AS last_day
    FROM packed GROUP BY bin_id
    """,
)
def layout_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the table-maintenance job
    behind OPTIMIZE/rewrite: model the current layout as one file
    per ingestion day (day-grain row counts), then assign
    CONSECUTIVE files to output bins of ~{_COMPACT_TARGET} rows by
    bucketing the running row count (cum-before // target — the
    pipeline_pack_sequences shape).  Consecutive-order packing is
    deliberate: real compaction preserves the table's clustering
    (time order here), so bins must be contiguous ranges, not
    first-fit-decreasing bins that interleave dates.  The plan per
    bin (file count, rows, day range) is exactly what a rewrite job
    schedules.  Scale shape: one day-grain hash agg off the scan,
    then an ordered window over the DAY table — calendar-bounded
    (~2.4k rows/7 years), never data-sized — and a final tiny
    groupBy."""
    o = load_table(spark, sf_dir, "orders")
    files = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("d")
    ).agg(F.count("*").alias("n_rows"))
    from pyspark.sql.window import Window as W

    before = F.coalesce(
        F.sum("n_rows").over(
            W.orderBy("d").rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    packed = files.select(
        "d", "n_rows", before.alias("before")
    )
    return (
        packed.groupBy(
            F.floor(F.col("before") / _COMPACT_TARGET)
            .cast("long")
            .alias("bin_id")
        )
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_rows").cast("long").alias("total_rows"),
            F.min("d").cast("timestamp").alias("first_day"),
            F.max("d").cast("timestamp").alias("last_day"),
        )
    )


_TARGET_ROWS_PER_FILE = 25_000  # stand-in for a bytes-based target


@register(
    "layout_partition_skew_advisor",
    oracle=f"""
    WITH p AS (
      SELECT date_trunc('month', o_orderdate) AS part_month,
             CAST(count(*) AS DOUBLE) AS n_rows
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT part_month, n_rows,
             avg(n_rows) OVER () AS mean_rows,
             sum(n_rows) OVER () AS total_rows
      FROM p
    )
    SELECT part_month,
           CAST(n_rows AS BIGINT) AS n_rows,
           round(n_rows / total_rows - 1e-9, {_R}) + 0.0 AS share,
           round(n_rows / mean_rows - 1e-9, {_R}) + 0.0 AS skew_vs_mean,
           CAST(ceil(n_rows / {_TARGET_ROWS_PER_FILE}.0) AS BIGINT)
             AS recommended_files,
           round(n_rows / mean_rows - 1e-9, {_R}) > 2.0 AS salt_advised
    FROM t
    """,
)
def layout_partition_skew_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition-layout skew report for a month-partitioned orders
    table: per-partition row count, share of the table, skew ratio
    against the mean partition, the file count a writer should
    target (ceil(rows / target-per-file) — the knob behind
    `spark.sql.files.maxPartitionBytes` sizing), and a salt-advised
    flag when a partition exceeds 2× the mean — exactly the
    maintenance report a table service consults before compaction
    (layout_compaction_planner) or before enabling AQE skew-join
    handling on the write side.

    Scale shape: ONE partial-agg shuffle collapses the scan to
    |months| rows; the mean/total windows run over that calendar-
    bounded table only.  The advisory boolean compares the ROUNDED
    skew ratio on both engines."""
    p = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("part_month"))
        .agg(F.count("*").cast("double").alias("n_rows"))
    )
    w = Window.partitionBy()
    t = p.select(
        "part_month",
        "n_rows",
        F.avg("n_rows").over(w).alias("mean_rows"),
        F.sum("n_rows").over(w).alias("total_rows"),
    )
    skew_r = F.round(F.col("n_rows") / F.col("mean_rows") - 1e-9, _R)
    return t.select(
        "part_month",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.round(F.col("n_rows") / F.col("total_rows") - 1e-9, _R) + 0.0).alias(
            "share"
        ),
        (skew_r + 0.0).alias("skew_vs_mean"),
        F.ceil(F.col("n_rows") / float(_TARGET_ROWS_PER_FILE))
        .cast("long")
        .alias("recommended_files"),
        (skew_r > 2.0).alias("salt_advised"),
    )
