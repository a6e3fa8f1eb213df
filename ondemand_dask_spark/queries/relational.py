"""§2.B — projections, filters, predicates, null handling.

Reference surface: Dask DataFrame getitem/assign/drop/rename/astype,
boolean masks, `query()` string expressions, isin, where/mask,
dropna/fillna/replace, `.loc` range slices, head.  All map to single
declarative Spark constructs; Catalyst pushes every filter and
projection here down to the parquet scan (verified via
`.explain('formatted')` → PushedFilters / ReadSchema).

The fixtures contain no NULLs, so null-handling ops manufacture them
with NULLIF-equivalents identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.registry import register


@register(
    "proj_select",
    oracle="SELECT c_custkey, c_name, c_acctbal FROM customer",
)
def proj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df[['a','b']] — column projection (prunes the parquet scan)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "proj_assign",
    oracle="""
    SELECT o_orderkey,
           round((o_totalprice * 0.9) - 1e-9, 4) + 0.0 AS disc_total,
           o_orderpriority
    FROM orders
    """,
)
def proj_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.assign(x=...) — derived column via withColumn."""
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("disc_total", F.round((F.col("o_totalprice") * 0.9) - 1e-9, 4))
        .select("o_orderkey", "disc_total", "o_orderpriority")
    )


@register(
    "proj_drop_rename_cast",
    oracle="""
    SELECT c_custkey AS customer_id,
           c_name    AS customer_name,
           CAST(c_nationkey AS BIGINT) AS nation_id
    FROM customer
    """,
)
def proj_drop_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop(columns=) + rename(columns=) + astype() in one pipeline."""
    return (
        load_table(spark, sf_dir, "customer")
        .drop("c_acctbal", "c_mktsegment")
        .withColumnRenamed("c_custkey", "customer_id")
        .withColumnRenamed("c_name", "customer_name")
        .withColumn("nation_id", F.col("c_nationkey").cast("bigint"))
        .drop("c_nationkey")
    )


@register(
    "filter_mask",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 45
    """,
)
def filter_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df[df.x > 3] — boolean-mask filter (pushed to scan)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "filter_query_string",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 200000
    """,
)
def filter_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.query("...") — string expression filter via Spark SQL expr."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter("o_orderstatus = 'O' AND o_totalprice > 200000")
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "filter_isin",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.isin([...]) — membership predicate."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")
    )


@register(
    "cond_where_mask",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 0.0 ELSE round((c_acctbal) - 1e-9, 4) + 0.0 END AS bal_clipped,
           CASE WHEN c_acctbal >= 5000 THEN 'high'
                WHEN c_acctbal >= 0    THEN 'mid'
                ELSE 'neg' END AS bal_band
    FROM customer
    """,
)
def cond_where_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.where(cond, other) / np.select — F.when chains."""
    c = F.col("c_acctbal")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(c < 0, F.lit(0.0)).otherwise(F.round((c) - 1e-9, 4)).alias("bal_clipped"),
        F.when(c >= 5000, "high").when(c >= 0, "mid").otherwise("neg").alias("bal_band"),
    )


@register(
    "na_drop",
    oracle="""
    SELECT l_orderkey, l_linenumber, disc FROM (
      SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc
      FROM lineitem
    ) WHERE disc IS NOT NULL
    """,
)
def na_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.dropna(subset=) — NULLs manufactured via nullif."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc"),
        )
        .na.drop(subset=["disc"])
    )


@register(
    "na_fill",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_filled
    FROM lineitem
    """,
)
def na_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.fillna(v) — na.fill over manufactured NULLs."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_filled"),
        )
        .na.fill({"disc_filled": -1.0})
    )


@register(
    "replace_value",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 'BLDG'
                ELSE c_mktsegment END AS segment
    FROM customer
    """,
)
def replace_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.replace(a, b) — value substitution via na.replace."""
    return (
        load_table(spark, sf_dir, "customer")
        .withColumn("segment", F.col("c_mktsegment"))
        .na.replace({"BUILDING": "BLDG"}, subset=["segment"])
        .select("c_custkey", "segment")
    )


@register(
    "slice_loc_between",
    oracle="""
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                          AND TIMESTAMP '1997-03-31 00:00:00'
    """,
)
def slice_loc_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.loc[a:b] on known divisions — index-range slice; here a
    BETWEEN range filter that prunes parquet row groups via stats."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").between(
                F.lit("1997-01-01").cast("timestamp_ntz"),
                F.lit("1997-03-31").cast("timestamp_ntz"),
            )
        )
        .select("o_orderkey", "o_orderdate")
    )


@register(
    "topn_head",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 5",
)
def topn_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.head(n) — deterministic via explicit order + limit."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(5)
    )


@register(
    "sample_seeded",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE CAST('0x' || substr(md5('42|' || CAST(o_orderkey AS VARCHAR)), 1, 15)
               AS BIGINT) % 10000 < 1000
    """,
)
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded sampling contract (the engine surface behind
    `df.sample(frac, random_state)`), fulfilled by a DETERMINISTIC
    salted-hash draw rather than Spark's native Bernoulli sampler:
    row kept iff hash(seed|key) % 10000 < frac·10000.
    `df.sample(seed=)`'s own draw is reproducible only per
    partitioning (the RNG streams by partition index), so it is
    neither stable across repartitions nor expressible to another
    engine — rows-only forever; the native sampler path itself stays
    exercised by tests/test_native_sampler.py.  Salting
    the seed into a key hash keeps the seeded-sampling contract
    (same seed → same sample; different seed → a fresh, independent
    sample) while making membership a pure function of (seed, key):
    reproducible across engines, runs, partitionings, and appends,
    and hence FULLY oracle-checkable (was the r8 verdict's rows-only
    floor ask).  Narrow op, no shuffle, prunes at the scan; the
    binomial-bound twin test (tests/test_rows_only_twins.py) still
    pins that the hash draw behaves statistically like the Bernoulli
    it replaces."""
    from ondemand_dask_spark.functions.texthash import portable_hash64

    o = load_table(spark, sf_dir, "orders")
    bucket = portable_hash64(
        F.concat(F.lit("42|"), F.col("o_orderkey").cast("string"))
    ) % 10000
    return o.filter(bucket < 1000).select("o_orderkey", "o_totalprice")


@register(
    "sample_hash_split",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                          AS BIGINT) % 100 < 80
                THEN 'train' ELSE 'eval' END AS split
    FROM documents
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 100 < 90
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling + train/eval split — the
    training-pipeline replacement for RNG sampling (`sample_seeded`):
    membership is a pure function of the row KEY, so the sample is
    reproducible across runs, engines, repartitions, and appends
    (`df.sample`'s Bernoulli draw is none of these — it depends on
    partition iteration order).  90% keep → 80/20 split inside the
    keep-set, all from one md5; a narrow op with no shuffle, and the
    filter prunes before any downstream join."""
    from ondemand_dask_spark.functions.texthash import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    bucket = portable_hash64(F.col("doc_id").cast("string")) % 100
    return (
        d.filter(bucket < 90)
        .select(
            "doc_id",
            "lang",
            F.when(bucket < 80, "train").otherwise("eval").alias("split"),
        )
    )


@register(
    "sample_weighted",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE CAST('0x' || substr(md5('w|' || CAST(o_orderkey AS VARCHAR)), 1, 15)
               AS BIGINT) % 1000 <
          CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 300
               WHEN o_orderpriority = '3-MEDIUM' THEN 100
               ELSE 20 END
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.sample(weights=...) — per-row inclusion probability driven
    by a weight column (here: priority class → 30% / 10% / 2%), as a
    DETERMINISTIC salted-hash Bernoulli: row kept iff
    hash(salt|key) % 1000 < weight·1000.  Same contract as
    `sample_hash_split`: membership is a pure function of the key,
    so the weighted sample is reproducible across engines, runs, and
    repartitions, while RNG-based weighted draws are not even stable
    across partitionings.  Narrow op, no shuffle, prunes at the
    scan."""
    from ondemand_dask_spark.functions.texthash import portable_hash64

    o = load_table(spark, sf_dir, "orders")
    w = (
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 300
        )
        .when(F.col("o_orderpriority") == "3-MEDIUM", 100)
        .otherwise(20)
    )
    bucket = portable_hash64(
        F.concat(F.lit("w|"), F.col("o_orderkey").cast("string"))
    ) % 1000
    return o.filter(bucket < w).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


@register(
    "combine_first",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS price,
             o_orderstatus
      FROM orders WHERE o_orderkey % 3 <> 0
    ), b AS (
      SELECT o_orderkey, o_totalprice * 0.5 AS price, o_orderpriority
      FROM orders
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           round(COALESCE(a.price, b.price) - 1e-9, 4) + 0.0 AS price,
           a.o_orderstatus AS o_orderstatus,
           b.o_orderpriority AS o_orderpriority
    FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey
    """,
)
def combine_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.combine_first(other) — patch one frame's holes with another,
    keeping the union of rows and columns: full outer join on the row
    key + per-column COALESCE preferring self.  The primary frame
    here is missing a third of the rows and a seventh of its prices;
    the fallback frame supplies a default price for both kinds of
    hole.  A single hash-partitioned equi full-join on a unique key —
    no skew, and at 100 TB both sides co-shuffle once on o_orderkey
    (unlike pandas' index alignment, which needs the index
    materialized and sorted)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("price_a"),
        "o_orderstatus",
    )
    b = o.select(
        "o_orderkey",
        (F.col("o_totalprice") * 0.5).alias("price_b"),
        "o_orderpriority",
    )
    j = a.join(b, "o_orderkey", "full")
    return j.select(
        "o_orderkey",
        F.round(F.coalesce("price_a", "price_b") - 1e-9, 4).alias("price"),
        "o_orderstatus",
        "o_orderpriority",
    )


@register(
    "flag_duplicated",
    oracle="""
    SELECT doc_id,
           (row_number() OVER (PARTITION BY md5(lower(trim(text)))
                               ORDER BY doc_id) > 1) AS is_duplicate
    FROM documents
    """,
)
def flag_duplicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.duplicated(keep='first') — a per-row boolean marking every
    row whose (normalized) key already appeared on a lower doc_id,
    WITHOUT dropping anything (the audit view of dedup: joinable
    back to the corpus, feeds keep/drop reports).  One window over
    the digest partition — same single digest shuffle as
    `dedup_exact`, which is this op's aggregate twin."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
    return d.select(
        "doc_id", (F.row_number().over(w) > 1).alias("is_duplicate")
    )


@register(
    "sample_n_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, hrank
    FROM (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
             ) AS hrank
      FROM orders
    )
    WHERE hrank <= 5
    """,
)
def sample_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic N-per-group sampling — eval-set construction's
    workhorse ('5 examples per category, same 5 every run, any
    engine'): rank rows inside each group by the md5 of their key (a
    seedless, engine-portable shuffle order) and keep the first 5.
    No RNG, no state: the sample is a pure function of the data, so
    reruns, backfills, and cross-engine checks all agree.  One
    per-group window; group sizes bound the sort, and at 100 TB the
    rank-filter pushes down to TakeOrderedAndProject-per-group via
    LimitPushDownThroughWindow when the group count is high."""
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    return (
        o.select(
            "o_orderpriority", "o_orderkey",
            F.row_number().over(w).alias("hrank"),
        )
        .filter(F.col("hrank") <= 5)
    )


_AES_K = 20
_AES_M = 1_048_576  # hash-uniform resolution (2^20 buckets)


@register(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH keyed AS (
      SELECT o_orderkey, o_totalprice,
             round(
               ln((CAST('0x' || substr(md5('aes|' || CAST(o_orderkey AS VARCHAR)), 1, 15)
                        AS BIGINT) % {_AES_M} + 0.5) / {_AES_M})
               / o_totalprice - 1e-9, 9) + 0.0 AS sel_key
      FROM orders
    )
    SELECT o_orderkey, round(o_totalprice - 1e-9, 4) + 0.0 AS weight,
           sel_key
    FROM keyed
    ORDER BY sel_key DESC, o_orderkey
    LIMIT {_AES_K}
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact size k — the
    Efraimidis–Spirakis one-pass reservoir: each row draws
    u ∈ (0,1) and survives if its key u^(1/w) ranks top-k
    (equivalently ln(u)/w, the form computed here for numeric
    stability).  Unlike the Bernoulli `sample_weighted`, the output
    size is EXACTLY k and inclusion competition is global — the
    algorithm behind weighted reservoir sampling in every streaming
    system.  u comes from the salted portable hash, so the draw is
    deterministic and the differential check exact; keys are rounded
    to 9 dp before ranking (with the id tiebreak) so a last-ulp ln()
    divergence between engines cannot reorder the selection
    boundary.  The top-k plans as TakeOrderedAndProject:
    per-partition heaps then a k-row merge — one pass, no global
    sort, at any scale."""
    from ondemand_dask_spark.functions.texthash import portable_hash64

    o = load_table(spark, sf_dir, "orders")
    u = (
        portable_hash64(
            F.concat(F.lit("aes|"), F.col("o_orderkey").cast("string"))
        )
        % _AES_M
        + 0.5
    ) / F.lit(float(_AES_M))
    # repo-standard round(x - 1e-9, 9) + 0.0 nudge: ln() can differ by
    # an ulp between engines and sel_key is both a hash-compared
    # output column and the selection boundary.
    key = F.round(F.log(u) / F.col("o_totalprice") - 1e-9, 9) + 0.0
    return (
        o.select(
            "o_orderkey",
            (F.round(F.col("o_totalprice") - 1e-9, 4) + 0.0).alias("weight"),
            key.alias("sel_key"),
        )
        .orderBy(F.desc("sel_key"), F.asc("o_orderkey"))
        .limit(_AES_K)
    )


_AESG_K = 4  # exact sample size per group


@register(
    "sample_weighted_reservoir_group",
    oracle=f"""
    WITH keyed AS (
      SELECT o_orderpriority, o_orderkey,
             round(
               ln((CAST('0x' || substr(md5('aesg|' || CAST(o_orderkey AS VARCHAR)), 1, 15)
                        AS BIGINT) % {_AES_M} + 0.5) / {_AES_M})
               / o_totalprice - 1e-9, 9) + 0.0 AS sel_key
      FROM orders
    ),
    r AS (
      SELECT o_orderpriority, o_orderkey, sel_key,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY sel_key DESC, o_orderkey) AS rn
      FROM keyed
    )
    SELECT o_orderpriority, o_orderkey, sel_key
    FROM r WHERE rn <= {_AESG_K}
    """,
)
def sample_weighted_reservoir_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group weighted sampling WITHOUT replacement, exact size
    {_AESG_K} per group — the stratified form of
    `sample_weighted_reservoir` (same Efraimidis–Spirakis keys, same
    salted portable hash for the deterministic draw, same
    round-before-rank discipline on sel_key), with the top-k
    competition scoped to each o_orderpriority stratum.  The
    stratified eval-set builder: 'k examples per class, weighted by
    importance, same k every run on any engine.'

    Scale shape: ONE key-partitioned window (group sizes bound the
    sort; LimitPushDownThroughWindow turns the rank filter into a
    per-group heap via WindowGroupLimit) — no global window, no
    second pass, at any scale."""
    from ondemand_dask_spark.functions.texthash import portable_hash64
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    u = (
        portable_hash64(
            F.concat(F.lit("aesg|"), F.col("o_orderkey").cast("string"))
        )
        % _AES_M
        + 0.5
    ) / F.lit(float(_AES_M))
    key = F.round(F.log(u) / F.col("o_totalprice") - 1e-9, 9) + 0.0
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("sel_key"), F.asc("o_orderkey")
    )
    return (
        o.select("o_orderpriority", "o_orderkey", key.alias("sel_key"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _AESG_K)
        .drop("rn")
    )


@register(
    "events_between_time",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_business_hours,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE (extract(hour FROM ts) * 60 + extract(minute FROM ts))
          BETWEEN 9 * 60 AND 17 * 60 - 1
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_between_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.between_time('09:00', '17:00') — the pandas time-of-day
    slice (select rows whose CLOCK time falls in a window,
    regardless of date), rolled up per event type.  Implemented as
    minute-of-day arithmetic on the timestamp — a codegen predicate
    the scan evaluates in place (at 100 TB this composes with
    partition pruning on the date dimension: the date partitions
    are pruned first, then this predicate slices within each).
    Window is inclusive-start / exclusive-end, matching pandas'
    default inclusive='both' minus the 17:00 boundary minute for an
    unambiguous cross-engine contract."""
    e = load_table(spark, sf_dir, "events")
    mod = F.hour("ts") * 60 + F.minute("ts")
    return (
        e.filter((mod >= 9 * 60) & (mod <= 17 * 60 - 1))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_business_hours"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


@register(
    "proj_select_dtypes",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def proj_select_dtypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.select_dtypes(include='number') — schema-driven column
    selection: the projection is computed FROM df.dtypes (numeric
    fields of lineitem), not hand-listed, exactly as the pandas call
    resolves it at runtime.  Catalyst turns the projection into scan
    ReadSchema pruning, so the non-numeric string/date columns are
    never read off parquet — the column-pruning contract §2.B
    requires."""
    li = load_table(spark, sf_dir, "lineitem")
    num = ("bigint", "int", "smallint", "tinyint", "double",
           "float", "decimal")
    cols = [c for c, t in li.dtypes if t.startswith(num)]
    return li.filter(F.col("l_orderkey") < 1000).select(*cols)
