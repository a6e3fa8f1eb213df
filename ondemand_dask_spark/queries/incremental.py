"""Incremental-maintenance operators — upsert MERGE, SCD-2, CDC diff.

The warehouse side of a continuously-refreshed corpus: applying a
change batch onto a snapshot (MERGE INTO semantics), compressing an
event stream into validity intervals (SCD type 2), and diffing two
snapshots back into a changelog.  Dask expresses these as
concat + drop_duplicates(keep='last') / groupby.apply idioms; here
each is a declarative join/window plan.

No table format (Delta/Iceberg) is assumed: these queries produce the
post-merge RESULT as a DataFrame — on a real lake the same plan runs
inside `MERGE INTO` / `writeStream.foreachBatch`.  Change batches are
derived deterministically from the fixtures (key arithmetic) so every
query is exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ondemand_dask_spark.functions.texthash import portable_hash64
from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.registry import register

_R = 4


@register(
    "merge_upsert",
    oracle=f"""
    SELECT o_orderkey,
           round(o_totalprice * 1.05 - 1e-9, {_R}) + 0.0 AS o_totalprice,
           'update' AS src
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey,
           round(o_totalprice - 1e-9, {_R}) + 0.0 AS o_totalprice,
           'base' AS src
    FROM orders WHERE o_orderkey % 10 <> 0
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (SCD type 1, last-wins upsert): a change batch
    (every 10th order, repriced) applied onto the base snapshot —
    matched keys take the update, unmatched keep the base row.
    Expressed as anti-join + union: ONE shuffle of the base on the
    merge key (the update side piggybacks; at real scale it
    broadcasts — change batches are small — making the merge
    shuffle-free on the base).  concat + drop_duplicates(keep='last')
    is the Dask idiom; the anti-join form never materializes the
    conflict rows twice."""
    o = load_table(spark, sf_dir, "orders")
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.05 - 1e-9, _R).alias(
                "o_totalprice"
            ),
            F.lit("update").alias("src"),
        )
    )
    base = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") - 1e-9, _R).alias("o_totalprice"),
        F.lit("base").alias("src"),
    )
    kept = base.join(
        F.broadcast(updates.select("o_orderkey")), "o_orderkey", "left_anti"
    )
    return kept.unionByName(updates)


@register(
    "scd2_intervals",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    ch AS (
      SELECT user_id, ts, event_id, event_type FROM o
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS version,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             IS NULL) AS is_current
    FROM ch
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type 2: the per-user event-type stream compressed into
    validity intervals — change rows detected with lag (gaps-and-
    islands), then valid_from/valid_to/version/is_current stitched
    with lead/row_number over the (much smaller) change set.  Two
    windows, but both partition on user_id with the same ordering, so
    Catalyst plans ONE shuffle+sort and evaluates them in place — the
    history table at 100 TB costs the same exchange as a single
    lag."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = load_table(spark, sf_dir, "events")
    ch = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "ts", "event_id", "event_type")
    )
    return ch.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "snapshot_diff_cdc",
    oracle=f"""
    WITH new_snap AS (
      SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 97 = 0          -- inserts
      UNION ALL
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0
                  THEN round(o_totalprice * 1.1 - 1e-9, 2) ELSE o_totalprice END
      FROM orders WHERE o_orderkey % 7 <> 0          -- deletes dropped
    )
    SELECT COALESCE(b.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           round(b.o_totalprice - 1e-9, {_R}) + 0.0 AS old_price,
           round(n.o_totalprice - 1e-9, {_R}) + 0.0 AS new_price
    FROM orders b
    FULL JOIN new_snap n ON b.o_orderkey = n.o_orderkey
    WHERE b.o_orderkey IS NULL OR n.o_orderkey IS NULL
          OR b.o_totalprice <> n.o_totalprice
    """,
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC extraction: two snapshots diffed back into a changelog of
    insert/update/delete rows (merge(indicator=True) in the Dask
    idiom).  A full outer join on the key, keeping only rows that
    differ — unchanged rows (the overwhelming majority at scale) are
    filtered before anything is materialized.  The join shuffles both
    snapshots on the key once; on bucketed/partitioned layouts it
    degrades to a zip of co-located partitions with zero exchange."""
    o = load_table(spark, sf_dir, "orders")
    new_snap = (
        o.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            "o_totalprice",
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 7 != 0).select(
                "o_orderkey",
                F.when(
                    F.col("o_orderkey") % 5 == 0,
                    F.round(F.col("o_totalprice") * 1.1 - 1e-9, 2),
                )
                .otherwise(F.col("o_totalprice"))
                .alias("o_totalprice"),
            )
        )
    )
    b = o.select(
        F.col("o_orderkey").alias("b_key"), F.col("o_totalprice").alias("b_price")
    )
    n = new_snap.select(
        F.col("o_orderkey").alias("n_key"), F.col("o_totalprice").alias("n_price")
    )
    j = b.join(n, b.b_key == n.n_key, "full_outer")
    return j.filter(
        F.col("b_key").isNull()
        | F.col("n_key").isNull()
        | (F.col("b_price") != F.col("n_price"))
    ).select(
        F.coalesce("b_key", "n_key").alias("o_orderkey"),
        F.when(F.col("b_key").isNull(), "insert")
        .when(F.col("n_key").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        F.round(F.col("b_price") - 1e-9, _R).alias("old_price"),
        F.round(F.col("n_price") - 1e-9, _R).alias("new_price"),
    )


_CKSUM_BUCKETS = 64
_CKSUM_MOD = 2**30


@register(
    "checksum_buckets",
    oracle=f"""
    SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
                AS BIGINT) % {_CKSUM_BUCKETS} AS bucket,
           count(*) AS n_rows,
           CAST(sum(CAST('0x' || substr(md5(
                 CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(o_custkey AS VARCHAR) || '|' ||
                 o_orderstatus || '|' ||
                 CAST(round(o_totalprice - 1e-9, 2) AS VARCHAR)
               ), 1, 15) AS BIGINT) % {_CKSUM_MOD}) AS BIGINT) AS checksum
    FROM orders
    GROUP BY bucket
    """,
)
def checksum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed order-insensitive table checksum — replication /
    migration validation without moving data: two systems each
    compute 64 (bucket, count, sum-of-row-hashes) rows and diff THOSE
    to localize divergence to a bucket (then drill down by splitting
    that bucket).  Row hashes are the engine-portable md5-derived
    int64 reduced mod 2^30 so the per-bucket sum stays far from int64
    overflow at any realistic bucket population (2^30 · 2^33 rows);
    addition is commutative, so the checksum is partition-order
    independent — a pure partial+final agg, one 64-row shuffle."""
    o = load_table(spark, sf_dir, "orders")
    key_h = portable_hash64(F.col("o_orderkey").cast("string"))
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") - 1e-9, 2).cast("string"),
    )
    return (
        o.select(
            (key_h % _CKSUM_BUCKETS).alias("bucket"),
            (portable_hash64(row_str) % _CKSUM_MOD).alias("rh"),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_rows"), F.sum("rh").alias("checksum"))
    )


@register(
    "incremental_partial_agg_merge",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             count(*) AS n,
             sum(value) AS s,
             min(value) AS mn,
             max(value) AS mx
      FROM events GROUP BY 1
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(sum(n) OVER w AS BIGINT) AS n_7d,
           round(sum(s) OVER w - 1e-9, {_R}) + 0.0 AS sum_7d,
           round(min(mn) OVER w - 1e-9, {_R}) + 0.0 AS min_7d,
           round(max(mx) OVER w - 1e-9, {_R}) + 0.0 AS max_7d
    FROM daily
    WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                 AND CURRENT ROW)
    """,
)
def incremental_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable partial-aggregate rollup — the incremental-compute
    pattern behind every 'rolling 7-day metric without rescanning 7
    days of facts' pipeline: maintain a per-day PARTIAL state table
    (count/sum/min/max are all mergeable: merge(a, b) loses nothing),
    then answer the rolling window by merging 7 tiny state rows,
    touching the facts exactly once ever.  The facts scan is one
    partial-agg groupBy(day); the merge window runs over the
    |days|-row state table — bounded, never data-sized.  The same
    pattern extends to sketches (the HLL/KLL/theta queries hold the
    mergeable-sketch leg); this query pins the exact-state leg.  The
    global RANGE window over the daily table is the bounded-input
    exception documented for agg_mode (|days| rows, one task, by
    design)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("ts").cast("timestamp").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    w = (
        Window.orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        F.col("day").cast("timestamp_ntz").alias("day"),
        F.sum("n").over(w).cast("long").alias("n_7d"),
        (F.round(F.sum("s").over(w) - 1e-9, _R) + F.lit(0.0)).alias("sum_7d"),
        (F.round(F.min("mn").over(w) - 1e-9, _R) + F.lit(0.0)).alias("min_7d"),
        (F.round(F.max("mx").over(w) - 1e-9, _R) + F.lit(0.0)).alias("max_7d"),
    )


_PIT_DATE = "1995-06-15"


@register(
    "scd2_pit_lookup",
    oracle=f"""
    WITH hist AS (
      SELECT o_custkey AS custkey, o_orderkey AS version_key,
             ts AS valid_from,
             coalesce(lead(ts) OVER (PARTITION BY o_custkey
                                     ORDER BY ts, o_orderkey),
                      TIMESTAMP '9999-12-31') AS valid_to,
             o_totalprice AS attr
      FROM (
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS ts,
               o_totalprice
        FROM orders
      )
    )
    SELECT custkey, version_key,
           round(attr - 1e-9, {_R}) + 0.0 AS attr_asof
    FROM hist
    WHERE valid_from <= TIMESTAMP '{_PIT_DATE}'
      AND valid_to > TIMESTAMP '{_PIT_DATE}'
    """,
)
def scd2_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) read over an SCD2 history — the lookup
    leg that makes the scd2_intervals build useful: reconstruct each
    key's attribute exactly as it stood on a given date by keeping
    the one version whose [valid_from, valid_to) straddles it.  The
    history build is the same lead-window interval derivation as
    scd2_intervals; the AS OF predicate is a pure filter, so at
    100 TB it prunes at the scan when the history is partitioned or
    z-ordered on valid_from — no join, no window at read time beyond
    the build itself."""
    o = load_table(spark, sf_dir, "orders")
    hist = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("version_key"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.col("o_totalprice").alias("attr"),
    ).select(
        "custkey", "version_key",
        F.col("ts").alias("valid_from"),
        F.coalesce(
            F.lead("ts").over(
                Window.partitionBy("custkey").orderBy("ts", "version_key")
            ),
            F.lit("9999-12-31").cast("timestamp"),
        ).alias("valid_to"),
        "attr",
    )
    pit = F.lit(_PIT_DATE).cast("timestamp")
    return hist.filter(
        (F.col("valid_from") <= pit) & (F.col("valid_to") > pit)
    ).select(
        "custkey", "version_key",
        (F.round(F.col("attr") - 1e-9, _R) + F.lit(0.0)).alias("attr_asof"),
    )


@register(
    "cdc_apply_with_deletes",
    oracle="""
    WITH batch AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
             round(o_totalprice * 1.1, 4) AS new_price
      FROM orders
      WHERE o_orderkey % 7 = 0 OR o_orderkey % 5 = 0
    )
    SELECT s.o_orderkey,
           round(CASE WHEN b.op = 'U' THEN b.new_price
                      ELSE round(s.o_totalprice, 4) END - 1e-9, 4) + 0.0
             AS price,
           (b.op IS NOT NULL) AS touched
    FROM orders s
    LEFT JOIN batch b USING (o_orderkey)
    WHERE b.op IS NULL OR b.op != 'D'
    """,
)
def cdc_apply_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC batch WITH tombstones to a snapshot — the full
    MERGE WHEN MATCHED THEN UPDATE / WHEN MATCHED AND op = 'D' THEN
    DELETE shape that `merge_upsert` (insert/update only) does not
    cover, and the batch twin of the streaming CDC-upsert job.  The
    batch is synthesized deterministically from the snapshot itself
    (keys % 7 = 0 delete, remaining % 5 = 0 update at +10%), so the
    differential check is exact.  One keyed left join on the
    snapshot's primary key + a filter — at 100 TB both sides
    partition on the key, and a real table service would feed the
    same plan from the change log instead of the synthetic batch."""
    o = load_table(spark, sf_dir, "orders")
    batch = o.filter(
        (F.col("o_orderkey") % 7 == 0) | (F.col("o_orderkey") % 5 == 0)
    ).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, "D").otherwise("U").alias("op"),
        F.round(F.col("o_totalprice") * 1.1, 4).alias("new_price"),
    )
    applied = o.select("o_orderkey", "o_totalprice").join(
        batch, "o_orderkey", "left"
    )
    return applied.filter(
        F.col("op").isNull() | (F.col("op") != "D")
    ).select(
        "o_orderkey",
        (
            F.round(
                F.when(F.col("op") == "U", F.col("new_price")).otherwise(
                    F.round(F.col("o_totalprice"), 4)
                )
                - 1e-9,
                4,
            )
            + 0.0
        ).alias("price"),
        F.col("op").isNotNull().alias("touched"),
    )


_SCD2_BASE_TS = "1995-01-01"
_SCD2_EFF_TS = "1998-06-01"


@register(
    "scd2_apply_changes",
    oracle=f"""
    WITH base AS (
      SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
    ),
    batch AS (
      SELECT c_custkey, round(c_acctbal + 100, 2) AS bal
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT c_custkey, round(bal - 1e-9, 2) + 0.0 AS bal,
           CAST('{_SCD2_BASE_TS}' AS TIMESTAMP) AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to,
           TRUE AS is_current
    FROM base WHERE c_custkey % 7 != 0
    UNION ALL
    SELECT c_custkey, round(bal - 1e-9, 2) + 0.0,
           CAST('{_SCD2_BASE_TS}' AS TIMESTAMP),
           CAST('{_SCD2_EFF_TS}' AS TIMESTAMP),
           FALSE
    FROM base WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey, round(bal - 1e-9, 2) + 0.0,
           CAST('{_SCD2_EFF_TS}' AS TIMESTAMP),
           CAST(NULL AS TIMESTAMP),
           TRUE
    FROM batch
    """,
)
def scd2_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD-2 APPLY — the dimension-maintenance MERGE that
    `scd2_intervals` (which rebuilds history from a full event log)
    does not cover: given the current dimension snapshot and a batch
    of changed rows, emit the new table state in one pass —
    untouched rows pass through, changed keys get their open row
    CLOSED (valid_to = effective ts) plus a NEW current row with the
    updated attribute.  Three legs: anti-join (pass-through),
    semi-join (close), and the batch itself (insert) — all keyed on
    the dimension's primary key, unioned by name.  At 100 TB the
    batch side is the small one; the two joins share one exchange of
    the snapshot and a real table service swaps the union's output
    in as the next snapshot version (the copy-on-write pattern the
    streaming CDC job uses).  The batch is synthesized from the
    snapshot (keys % 7, balance + 100) so the check is exact."""
    base_ts = F.lit(_SCD2_BASE_TS).cast("timestamp_ntz")
    eff_ts = F.lit(_SCD2_EFF_TS).cast("timestamp_ntz")
    null_ts = F.lit(None).cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
    batch = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") + 100, 2).alias("bal"),
        )
    )
    keys = batch.select("c_custkey")
    out_bal = (F.round(F.col("bal") - 1e-9, 2) + 0.0).alias("bal")
    unchanged = c.join(keys, "c_custkey", "left_anti").select(
        "c_custkey", out_bal,
        base_ts.alias("valid_from"), null_ts.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed = c.join(keys, "c_custkey", "left_semi").select(
        "c_custkey", out_bal,
        base_ts.alias("valid_from"), eff_ts.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    inserted = batch.select(
        "c_custkey", out_bal,
        eff_ts.alias("valid_from"), null_ts.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return unchanged.unionByName(closed).unionByName(inserted)


_VACUUM_HORIZON = "2024-01-20 00:00:00"  # time-travel retention cutoff


@register(
    "incremental_retention_vacuum",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    ch AS (
      SELECT user_id, ts, event_id, event_type FROM o
      WHERE prev IS NULL OR prev <> event_type
    ),
    hist AS (
      SELECT user_id, event_type,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version
      FROM ch
    )
    SELECT user_id, event_type, version, valid_from, valid_to
    FROM hist
    WHERE valid_to IS NOT NULL
      AND valid_to < TIMESTAMP '{_VACUUM_HORIZON}'
    """,
)
def incremental_retention_vacuum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retention-policy vacuum candidates over the SCD-2 history
    (scd2_intervals' build): versions that are BOTH superseded
    (valid_to set) and fully outside the time-travel horizon — the
    row set a lakehouse VACUUM/retention job may physically delete
    without breaking any time-travel query at or after the cutoff.
    Current versions and rows whose validity overlaps the horizon
    survive; pairs with pipeline_purge_audit (which proves what a
    purge removed) and layout_compaction_planner (which rewrites
    what remains).

    Scale shape: identical to scd2_intervals — both windows share
    ONE user-keyed shuffle+sort; the horizon filter is a residual
    predicate on the window output, so the vacuum scan costs exactly
    the history build.  The cutoff is a fixed timestamp literal,
    compared identically on both engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = load_table(spark, sf_dir, "events")
    ch = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter(
            F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
        )
        .select("user_id", "ts", "event_id", "event_type")
    )
    hist = ch.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
    )
    cut = F.lit(_VACUUM_HORIZON).cast("timestamp_ntz")
    return hist.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") < cut)
    ).select("user_id", "event_type", "version", "valid_from", "valid_to")
