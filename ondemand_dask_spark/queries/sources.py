"""§2.A — sources and sinks beyond parquet scans.

The reference reads/writes csv, json, orc, text, sql and converts
local frames (`from_pandas`).  Spark's readers/writers cover each;
the queries here are ROUND-TRIPS: write the driver's parquet data out
through the format under test into a scratch dir, read it back, and
aggregate — the DuckDB oracle computes the same aggregate from the
original parquet, so a hash match proves end-to-end format fidelity
(types, nulls, encoding), not just "the write didn't crash".

Explicit schemas are passed on every read (never inferSchema — at
100 TB schema inference is an extra full scan, and inferred types
drift).  `read_sql/to_sql` (JDBC) has no reachable database in this
container: `jdbc_source` documents the mapping and is registered
rows-only returning the would-be plan parameters.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.registry import register
from ondemand_dask_spark.sources import readers

_R = 4

_SCRATCH = os.path.join(tempfile.gettempdir(), "ondemand_dask_spark_io")


def _scratch(sf_dir: str, name: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(_SCRATCH, sf, name)


@register(
    "source_csv_roundtrip",
    oracle=f"""
    SELECT c_mktsegment, count(*) AS n,
           round(sum(c_acctbal) - 1e-9, {_R}) + 0.0 AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_csv/to_csv: parquet → csv (header) → read with explicit
    schema → aggregate.  Hash-matching the parquet oracle proves the
    csv codec preserved every value."""
    path = _scratch(sf_dir, "customer_csv")
    c = load_table(spark, sf_dir, "customer")
    c.write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    back = readers.read_csv(spark, path, schema, header=True)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.round(F.sum("c_acctbal") - 1e-9, _R).alias("total_bal"),
    )


@register(
    "source_json_roundtrip",
    oracle=f"""
    SELECT event_type, count(*) AS n,
           round(sum(value) - 1e-9, {_R}) + 0.0 AS total_value
    FROM events GROUP BY event_type
    """,
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_json/to_json: line-delimited JSON round-trip (the nested
    `props` string survives as an escaped JSON string field)."""
    path = _scratch(sf_dir, "events_json")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    e.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    back = readers.read_json(spark, path, schema)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value") - 1e-9, _R).alias("total_value"),
    )


@register(
    "source_orc_roundtrip",
    oracle=f"""
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice) - 1e-9, {_R}) + 0.0 AS total_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_orc/to_orc: ORC round-trip.  DuckDB has no ORC reader, so
    the oracle reads the ORIGINAL parquet — the hash match is the
    fidelity proof (SURVEY §2.A marks orc ✖ for direct oracles; the
    round-trip construction upgrades it to ✅)."""
    path = _scratch(sf_dir, "lineitem_orc")
    li = load_table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice") - 1e-9, _R).alias("total_price"),
    )


@register(
    "source_text_lines",
    oracle="""
    SELECT count(*) AS n_lines,
           CAST(sum(len(text)) AS BIGINT) AS total_chars,
           min(len(text)) AS min_len,
           max(len(text)) AS max_len
    FROM documents
    """,
)
def source_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_text (bag surface): documents written as raw lines, read
    back with spark.read.text, line/char stats vs the source table."""
    path = _scratch(sf_dir, "documents_txt")
    d = load_table(spark, sf_dir, "documents")
    d.select("text").write.mode("overwrite").text(path)
    back = spark.read.text(path)
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).alias("min_len"),
        F.max(F.length("value")).alias("max_len"),
    )


@register(
    "sink_partitioned_parquet",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity) - 1e-9, {_R}) + 0.0 AS total_qty
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_parquet(partition_on=…): hive-partitioned write + partition-
    pruned read-back.  The filter on the partition column prunes at
    the directory level (`PartitionFilters` in the scan node) — the
    layout that makes 100 TB tables cheap to slice."""
    path = _scratch(sf_dir, "lineitem_part")
    li = load_table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity") - 1e-9, _R).alias("total_qty"),
    )


@register(
    "source_from_pandas",
    oracle="""
    SELECT n.n_name, t.tier
    FROM nation n
    JOIN (VALUES (0, 'low'), (1, 'mid'), (2, 'high'), (3, 'top'), (4, 'elite'))
         t(r_regionkey, tier)
      ON t.r_regionkey = n.n_regionkey
    """,
)
def source_from_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_pandas: a driver-local pandas frame promoted to a
    DataFrame (Arrow path) and broadcast-joined as a lookup dim — the
    standard small-reference-table pattern."""
    import pandas as pd

    tiers = pd.DataFrame(
        {"r_regionkey": [0, 1, 2, 3, 4], "tier": ["low", "mid", "high", "top", "elite"]}
    )
    lookup = spark.createDataFrame(tiers)
    n = load_table(spark, sf_dir, "nation")
    return n.join(
        F.broadcast(lookup), n.n_regionkey == lookup.r_regionkey
    ).select("n_name", "tier")


@register(
    "source_fwf_roundtrip",
    oracle=f"""
    SELECT c_nationkey, count(*) AS n,
           round(sum(c_acctbal) - 1e-9, {_R}) + 0.0 AS total_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def source_fwf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_fwf: customers formatted to fixed-width text
    (10/4/12/12-char fields), read back via the substring-based fwf
    reader (sources/readers.py — Spark has no native one), aggregated
    against the parquet oracle.  acctbal is 2-decimal in the data, so
    %12.2f is lossless."""
    path = _scratch(sf_dir, "customer_fwf")
    c = load_table(spark, sf_dir, "customer")
    c.select(
        F.format_string(
            "%10d%4d%12.2f%-12s",
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        ).alias("value")
    ).write.mode("overwrite").text(path)
    back = readers.read_fwf(
        spark,
        path,
        colspecs=[(0, 10), (10, 14), (14, 26), (26, 38)],
        names=["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"],
        dtypes=["bigint", "int", "double", "string"],
    )
    return back.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.round(F.sum("c_acctbal") - 1e-9, _R).alias("total_bal"),
    )


@register(
    "source_from_map",
    oracle="""
    SELECT i AS part_id, i * 100 + j AS row_id,
           CAST(i * 100 + j AS DOUBLE) / 7 AS metric
    FROM generate_series(0, 7) t(i),
         generate_series(0, 99) u(j)
    """,
)
def source_from_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_map / from_delayed: build a collection by running a task
    per partition index.  Spark shape: `spark.range(n)` seeds one row
    per task, `mapInPandas` expands each into its partition's rows —
    generation happens ON the executors (the driver never holds the
    data), which is the entire point of from_delayed at scale."""
    import pandas as pd

    def gen(it):
        for pdf in it:
            for i in pdf["id"]:
                rows = pd.DataFrame({"j": range(100)})
                yield pd.DataFrame(
                    {
                        "part_id": int(i),
                        "row_id": int(i) * 100 + rows.j,
                        "metric": (int(i) * 100 + rows.j) / 7.0,
                    }
                )

    seeds = spark.range(8).repartition(8)
    return seeds.mapInPandas(gen, "part_id bigint, row_id bigint, metric double")


@register(
    "source_jdbc_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def source_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE read_sql_table/to_sql — a real JDBC round-trip against
    embedded Apache Derby (on Spark's classpath): `df.write.jdbc`
    creates the table, `spark.read.jdbc` ingests it back PARTITIONED
    (partitionColumn/lowerBound/upperBound/numPartitions → one
    range-predicate query per partition, the scale path for pulling a
    100 TB operational table into Spark: N concurrent range scans,
    no single-cursor bottleneck).  Values must hash-match the parquet
    table the rows came from."""
    # Key the Derby db dir by applicationId: Derby allows only ONE
    # JVM to boot a database, so a fixed path dual-boot-locks (XSDB6)
    # when a second session (pytest alongside the driver) runs this
    # query concurrently.
    url = (
        "jdbc:derby:"
        + os.path.join(
            tempfile.gettempdir(),
            "ondemand_dask_spark_jdbc",
            spark.sparkContext.applicationId,
            "db",
        )
        + ";create=true"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    nation.write.jdbc(url, "nation_rt", mode="overwrite", properties=props)
    return spark.read.jdbc(
        url,
        "nation_rt",
        column="n_nationkey",
        lowerBound=0,
        upperBound=25,
        numPartitions=4,
        properties=props,
    ).select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


@register(
    "jdbc_source_plan",
    oracle="""
    SELECT 'jdbc:postgresql://host/db' AS url,
           'orders'                    AS "table",
           'o_orderkey'                AS partition_column,
           min(o_orderkey)             AS lower,
           max(o_orderkey)             AS upper,
           8                           AS num_partitions
    FROM orders
    """,
)
def jdbc_source_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_sql_table/read_sql_query → spark.read.jdbc mapping: the
    partitioned-ingest plan the engine issues — predicate ranges for
    `partitionColumn` — the Spark analogue of the reference's
    per-partition SQL ingestion.  The live execution of this plan is
    `source_jdbc_roundtrip` (embedded Derby)."""
    bounds = load_table(spark, sf_dir, "orders").agg(
        F.min("o_orderkey").alias("lower"), F.max("o_orderkey").alias("upper")
    )
    n_parts = 8
    return bounds.select(
        F.lit("jdbc:postgresql://host/db").alias("url"),
        F.lit("orders").alias("table"),
        F.lit("o_orderkey").alias("partition_column"),
        "lower",
        "upper",
        F.lit(n_parts).alias("num_partitions"),
    )


@register(
    "source_binaryfile",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest
    FROM documents WHERE doc_id < 50
    """,
)
def source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.read.format('binaryFile') — the multimodal ingestion
    path (SURVEY §2.K): opaque files land as (path, length, content
    binary) rows.  Staged here by writing 50 documents as .bin files
    named by doc_id, reading them back through the binaryFile source,
    and recovering doc_id from the filename — checked against the
    documents the bytes came from (length + md5 must round-trip).
    At 100 TB this source partitions by file and never decodes
    payloads in the scan."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    sf = os.path.basename(sf_dir.rstrip("/"))
    out = os.path.join(tempfile.gettempdir(), "ondemand_dask_spark_binfiles", sf)
    if not os.path.exists(os.path.join(out, "_STAGED")):
        os.makedirs(out, exist_ok=True)
        for r in d.collect():  # 50 bounded rows: staging only, not an operator path
            with open(os.path.join(out, f"{r['doc_id']}.bin"), "wb") as f:
                f.write(r["text"].encode("utf-8"))
        open(os.path.join(out, "_STAGED"), "w").close()
    bf = spark.read.format("binaryFile").load(out).filter(
        ~F.col("path").endswith("_STAGED")
    )
    return bf.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1).cast("bigint").alias(
            "doc_id"
        ),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("digest"),
    )


@register(
    "source_range",
    oracle="""
    SELECT id, id % 7 AS bucket, id * id AS sq
    FROM range(0, 10000) t(id)
    """,
)
def source_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.range — the generate_series/range source (the reference
    builds these via from_delayed over np.arange chunks).  Generated
    DISTRIBUTED: numPartitions=8 slices the [0, n) interval so each
    task materializes its own slice; at 100 TB this is the seed for
    synthetic-data generation with zero input I/O."""
    r = spark.range(0, 10_000, 1, 8)
    return r.select(
        "id",
        (F.col("id") % 7).alias("bucket"),
        (F.col("id") * F.col("id")).alias("sq"),
    )


@register(
    "source_xml_roundtrip",
    oracle=f"""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip — Spark 4's built-in xml data source (rowTag
    records), a format Dask never had; DuckDB has no XML reader
    either, so as with ORC the oracle reads the ORIGINAL table and
    the hash match proves write→read fidelity.  XML is a row-at-a-
    time text format: fine for config-sized dimension feeds (nation
    here), never for fact tables — the engine treats it as an ingest
    edge, immediately re-landed as parquet."""
    path = _scratch(sf_dir, "nation_xml")
    n = load_table(spark, sf_dir, "nation")
    (
        n.select("n_nationkey", "n_name", "n_regionkey")
        .write.format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .mode("overwrite")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .load(path)
    )
    return back.select("n_nationkey", "n_name", "n_regionkey")


@register(
    "source_parquet_merge_schema",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(o_totalprice) - 1e-9, {_R}) + 0.0 AS total_price,
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_status
    FROM (
      SELECT o_orderpriority, o_totalprice, NULL AS o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderpriority, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 1
    )
    GROUP BY o_orderpriority
    """,
)
def source_parquet_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read — the data-lake reality where older
    parquet partitions lack columns newer ones carry: two physical
    writes with DIFFERENT schemas (the even-key half without
    o_orderstatus, the odd-key half with it) land under one
    directory, and a single `mergeSchema` read reconciles them,
    null-filling the missing column.  The footer-union happens at
    planning time (mergeSchema pays a footer read per file — on a
    100 TB lake pin the merged schema in a metastore instead and let
    the scan null-fill per file for free; this query proves the
    null-fill semantics either way).  Oracle reproduces the
    evolution with a typed UNION ALL over the source table."""
    base = _scratch(sf_dir, "orders_evolved")
    o = load_table(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderpriority", "o_totalprice"
    ).write.mode("overwrite").parquet(os.path.join(base, "v1"))
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderpriority", "o_totalprice", "o_orderstatus"
    ).write.mode("overwrite").parquet(os.path.join(base, "v2"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "v1"), os.path.join(base, "v2")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        (F.round(F.sum("o_totalprice") - 1e-9, _R) + F.lit(0.0)).alias(
            "total_price"
        ),
        F.sum(
            F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0)
        ).alias("n_null_status"),
    )


@register(
    "source_python_datasource",
    oracle="""
    WITH g AS (
      SELECT i AS id,
             i % 7 AS bucket,
             CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8) AS BIGINT)
               AS h
      FROM (SELECT unnest(generate_series(0, 9999)) AS i)
    )
    SELECT bucket, count(*) AS n, CAST(sum(h) AS BIGINT) AS h_sum,
           CAST(min(id) AS BIGINT) AS first_id
    FROM g GROUP BY bucket
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python DataSource API — the extension point for
    reading systems Spark has no connector for (internal services,
    bespoke formats): a custom `DataSource` registered with
    `spark.dataSource.register`, partition-parallel (each of 8
    reader partitions generates its own deterministic id range, so
    the scan distributes like any other source), producing md5-keyed
    rows the oracle regenerates with pure SQL.  The Python boundary
    is the source itself — everything downstream (groupBy, sums) is
    JVM codegen; this is the one place a per-row Python cost is the
    price of admission, and it parallelizes across partitions."""
    import hashlib

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    n_rows, n_parts = 10_000, 8

    class _Reader(DataSourceReader):
        def partitions(self):
            step = n_rows // n_parts
            return [
                InputPartition((i * step, min((i + 1) * step, n_rows)))
                for i in range(n_parts)
            ]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                yield (i, i % 7, h)

    class _Synthetic(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_md5"

        def schema(self):
            return "id long, bucket long, h long"

        def reader(self, schema):
            return _Reader()

    try:
        spark.dataSource.register(_Synthetic)
    except Exception:
        pass  # already registered in this session
    df = spark.read.format("synthetic_md5").load()
    return df.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("h").alias("h_sum"),
        F.min("id").alias("first_id"),
    )


@register(
    "source_csv_corrupt_permissive",
    oracle="""
    WITH raw AS (
      SELECT CAST(c_custkey AS VARCHAR) AS k,
             CASE WHEN c_custkey % 10 = 3 THEN 'not_a_number'
                  ELSE CAST(c_custkey * 2 AS VARCHAR) END AS v
      FROM customer
    )
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN v = 'not_a_number' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_corrupt,
           CAST(sum(CASE WHEN v <> 'not_a_number'
                    THEN CAST(v AS BIGINT) ELSE 0 END) AS BIGINT) AS v_sum
    FROM raw
    """,
)
def source_csv_corrupt_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV ingestion of a corrupt feed — the production
    default where one bad row must not kill the job: a CSV written
    with a malformed numeric field on every custkey ending in 3 is
    read back with an explicit schema + `columnNameOfCorruptRecord`,
    so malformed rows surface as a quarantine column (value NULL,
    raw line preserved) instead of an exception (FAILFAST) or a
    silent drop (DROPMALFORMED).  The report counts clean vs
    quarantined rows and sums the clean values — the audit a
    quarantine pipeline emits.  Schema-explicit read keeps the scan
    a single pass with no inference job."""
    path = _scratch(sf_dir, "customer_corrupt_csv")
    c = load_table(spark, sf_dir, "customer")
    feed = c.select(
        F.col("c_custkey").cast("string").alias("k"),
        F.when(F.col("c_custkey") % 10 == 3, F.lit("not_a_number"))
        .otherwise((F.col("c_custkey") * 2).cast("string"))
        .alias("v"),
    )
    feed.write.mode("overwrite").option("header", "true").csv(path)
    back = (
        spark.read.schema("k string, v long, _corrupt string")
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("_corrupt").isNotNull().cast("int")).cast("long").alias(
            "n_corrupt"
        ),
        F.sum(F.coalesce(F.col("v"), F.lit(0))).alias("v_sum"),
    )


@register(
    "source_csv_multiline_quoted",
    oracle="""
    SELECT count(*) AS n_docs,
           CAST(sum(CASE WHEN contains(ml, chr(10)) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_multiline,
           CAST(sum(CAST('0x' || substr(md5(ml), 1, 15) AS BIGINT)
                    % 1000000) AS BIGINT) AS hash_sum
    FROM (SELECT 'hdr:' || chr(10) || text AS ml FROM documents)
    """,
)
def source_csv_multiline_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip of values containing EMBEDDED NEWLINES — the
    ingestion shape that silently corrupts naive line-split readers:
    a record's text field spans physical lines, so the reader must
    honor quoting across line boundaries (`multiLine=true`; Spark's
    writer quotes such fields automatically).  Every document gets a
    manufactured leading line, round-trips through CSV, and the
    check hashes the reconstructed values against the oracle's
    direct computation from parquet — a single flipped or lost
    newline changes hash_sum.  Note the scale caveat baked into the
    option: multiLine CSV cannot be split within a file (records
    cross line boundaries), so parallelism is per-FILE — this write
    produces one file per shuffle partition, which is exactly how
    the format stays parallel at 100 TB."""
    from ondemand_dask_spark.functions.texthash import portable_hash64

    path = _scratch(sf_dir, "documents_multiline_csv")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("hdr:\n"), F.col("text")).alias("ml"),
    )
    d.write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ml", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .csv(path)
    )
    return back.agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(F.col("ml").contains("\n"), 1).otherwise(0)
        ).alias("n_multiline"),
        F.sum(portable_hash64(F.col("ml")) % 1_000_000).alias("hash_sum"),
    )
