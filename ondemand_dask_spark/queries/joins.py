"""§2.C — the join family.

Dask's single logical `merge` has three physical strategies (hash
shuffle / broadcast / aligned-interval); Spark's planner subsumes all
of them (sort-merge, shuffled-hash, broadcast-hash via AQE, BNLJ for
non-equi), so every row here is a declarative `join` with the right
hint — no custom executor.

Scale notes: fact-fact joins (orders⋈lineitem) shuffle on the key —
at 100 TB that is the intended plan (co-partitioned sort-merge;
bucketing both tables on the key removes the shuffle entirely, see
sources/bucketing.py).  Dimension joins broadcast: `F.broadcast` on
provably bounded sides, AQE runtime-converts the rest.  Semi/anti
joins use the native left_semi/left_anti types — they never
duplicate-amplify and the build side only carries the key columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.registry import register


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd.merge(l, r, on=, how='inner') — equi inner join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_left",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 300000
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """how='left' — unmatched left rows survive with NULL right cols."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000), "left"
    ).select("c_custkey", "o_orderkey")


@register(
    "join_right",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM orders RIGHT JOIN customer
      ON c_custkey = o_custkey AND o_totalprice > 300000
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """how='right' — mirror of left join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return o.join(
        c, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000), "right"
    ).select("c_custkey", "o_orderkey")


@register(
    "join_full_outer",
    oracle="""
    WITH hi_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
         hi_ord  AS (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 300000)
    SELECT c_custkey, round((c_acctbal) - 1e-9, 4) + 0.0 AS acctbal, o_orderkey
    FROM hi_cust FULL JOIN hi_ord ON c_custkey = o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """how='outer' — full outer join with unmatched rows on both sides."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_acctbal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey", "o_orderkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", F.round(F.col("c_acctbal") - 1e-9, 4).alias("acctbal"), "o_orderkey"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """how='cross' — cartesian product (bounded sides only)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_broadcast",
    oracle="""
    SELECT n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast path — small side replicated to every task, zero
    shuffle on the big side (plan shows BroadcastHashJoin)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_name", "r_name"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join — native left_semi: no right columns, no row
    amplification (the Dask idiom l[l.k.isin(r.k)] needs a distinct
    + shuffle; this is one hash-semi pass)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 350000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — native left_anti (the Dask merge(indicator=True) →
    _merge == 'left_only' idiom, without materializing the join)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_indicator",
    oracle="""
    WITH hi_cust AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
         hi_ord  AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000)
    SELECT COALESCE(c_custkey, o_custkey) AS custkey,
           CASE WHEN c_custkey IS NULL THEN 'right_only'
                WHEN o_custkey IS NULL THEN 'left_only'
                ELSE 'both' END AS merge_ind
    FROM hi_cust FULL JOIN hi_ord ON c_custkey = o_custkey
    """,
)
def join_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge(indicator=True) — provenance column over a full join."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
        .distinct()
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), "right_only")
        .when(F.col("o_custkey").isNull(), "left_only")
        .otherwise("both")
        .alias("merge_ind"),
    )


@register(
    "join_theta",
    oracle="""
    SELECT a.r_regionkey AS lo_key, b.r_regionkey AS hi_key
    FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join — planner picks broadcast-nested-loop;
    only valid for bounded sides (here region×region)."""
    a = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("lo_key")
    )
    b = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("hi_key")
    )
    return a.join(b, a.lo_key < b.hi_key)


@register(
    "join_interval",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_early_ships
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (point-in-range) — equi key keeps it a hash/SMJ
    join; the range predicate is evaluated post-match, so there is no
    cartesian blow-up at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_early_ships"))
    )


@register(
    "concat_axis1",
    oracle="""
    WITH a AS (SELECT c_custkey, c_name FROM customer),
         b AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 0)
    SELECT a.c_custkey, c_name, round((c_acctbal) - 1e-9, 4) + 0.0 AS acctbal
    FROM a LEFT JOIN b ON a.c_custkey = b.c_custkey
    """,
)
def concat_axis1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd.concat([l, r], axis=1) — align by index: an outer join on
    the row key (here the full left side, so LEFT JOIN)."""
    a = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    b = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("bk"), "c_acctbal")
    )
    return a.join(b, a.c_custkey == b.bk, "left").select(
        "c_custkey", "c_name", F.round(F.col("c_acctbal") - 1e-9, 4).alias("acctbal")
    )


@register(
    "join_range_bucketed",
    oracle="""
    WITH err AS (
      SELECT event_id AS err_id, ts AS lo FROM events
      WHERE event_type = 'error'
    )
    SELECT err_id, e.event_id,
           epoch_us(e.ts) - epoch_us(lo) AS gap_us
    FROM events e JOIN err
      ON e.ts >= lo AND e.ts < lo + INTERVAL 10 MINUTE
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE range join (no equi key): every event inside the 10-minute
    window after any error event.  Written naively this is
    BroadcastNestedLoopJoin — O(|events|·|errors|) comparisons; the
    bucketed_range_join operator manufactures a 10-minute-bucket equi
    key (intervals replicated into ≤ 2 buckets each) so the planner
    hashes/merges on the bucket and only co-bucketed rows are
    compared.  Plan-asserted: no BNLJ, no cartesian."""
    from ondemand_dask_spark.operators.rangejoin import bucketed_range_join

    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("p")
    )
    err = (
        e.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("lo"),
        )
        .withColumn("hi", F.col("lo") + F.lit(600_000_000))
    )
    joined = bucketed_range_join(
        ev, err, left_point="p", right_lo="lo", right_hi="hi",
        bucket_width=600_000_000,
    )
    return joined.select(
        "err_id", "event_id", (F.col("p") - F.col("lo")).alias("gap_us")
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH err AS (
      SELECT event_id AS err_id, epoch_us(ts) AS e_lo,
             epoch_us(ts) + 600000000 AS e_hi
      FROM events WHERE event_type = 'error'
    ),
    pur AS (
      SELECT event_id AS pur_id, epoch_us(ts) AS p_lo,
             epoch_us(ts) + 600000000 AS p_hi
      FROM events WHERE event_type = 'purchase'
    )
    SELECT err_id, pur_id,
           greatest(e_lo, p_lo) AS overlap_lo,
           least(e_hi, p_hi) AS overlap_hi
    FROM err JOIN pur ON e_lo < p_hi AND p_lo < e_hi
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval OVERLAP join (no keys at all): error windows × purchase
    windows that intersect.  The bucketed operator emits each pair
    exactly once — in the bucket holding the overlap start — so the
    equi-join plan needs no dedup; the oracle is the naive overlap
    predicate.  Same no-BNLJ guarantee as join_range_bucketed."""
    from ondemand_dask_spark.operators.rangejoin import (
        bucketed_interval_overlap_join,
    )

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))

    def windows(etype: str, tag: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(f"{tag}_id"),
                us.alias(f"{tag[0]}_lo"),
                (us + F.lit(600_000_000)).alias(f"{tag[0]}_hi"),
            )
        )

    joined = bucketed_interval_overlap_join(
        windows("error", "err"), windows("purchase", "pur"),
        left_lo="e_lo", left_hi="e_hi", right_lo="p_lo", right_hi="p_hi",
        bucket_width=600_000_000,
    )
    return joined.select(
        "err_id",
        "pur_id",
        F.greatest("e_lo", "p_lo").alias("overlap_lo"),
        F.least("e_hi", "p_hi").alias("overlap_hi"),
    )


@register(
    "join_null_safe",
    oracle="""
    WITH s AS (
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE s_nationkey END AS nk
      FROM supplier
    ), n AS (
      SELECT n_name,
             CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END AS nk
      FROM nation
    )
    SELECT s.s_suppkey, n.n_name
    FROM s JOIN n ON s.nk IS NOT DISTINCT FROM n.nk
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (pandas merge treats NaN keys as equal —
    SQL '=' does not): Spark's `eqNullSafe` (<=>) against DuckDB's
    IS NOT DISTINCT FROM.  <=> is still a hash-joinable equi key, so
    the plan stays a broadcast/shuffled HASH join — no fallback to a
    nested-loop predicate join; NULL keys co-locate like any other
    key value (and at scale a heavily-NULL key is a skew key — the
    same salting lever applies)."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("s_nationkey"))
        .alias("nk"),
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_name",
        F.when(F.col("n_nationkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("n_nationkey"))
        .alias("nk"),
    )
    return s.join(F.broadcast(n), s["nk"].eqNullSafe(n["nk"])).select(
        "s_suppkey", "n_name"
    )


_SSJ_T = 0.6  # token-set Jaccard threshold


@register(
    "join_set_similarity",
    scale_class="certificate",  # complete on ANY distribution, but
    # this fixture's ~92-word p_name vocabulary defeats the prefix
    # filter by construction (candidates approach n²; 47.8 s at
    # sf0.1) — the production-scale evidence is the realistic-
    # vocabulary probe (tools/probe_prefix_filter.py: 100k sets,
    # 116× candidate cut); correctness gates at sf0.01 per round.
    oracle=f"""
    WITH s AS (
      SELECT p_partkey, list_distinct(string_split(p_name, ' ')) AS t
      FROM part
    )
    SELECT a.p_partkey AS pa, b.p_partkey AS pb,
           round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                 / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)))
                 - 1e-9, 4) + 0.0 AS jaccard
    FROM s a JOIN s b ON a.p_partkey < b.p_partkey
    WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
          / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= {_SSJ_T}
    """,
)
def join_set_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity self-join (fuzzy string join): all part-name
    pairs whose distinct-token Jaccard is >= 0.6, via the PREFIX
    FILTER (PPJoin family) — the canonical complete blocking for
    similarity joins, which Spark has no native operator for.

    Why it is complete: order every token set by ascending global
    document frequency (rare first, ties by token); a pair with
    J >= t must share at least ceil(t*|A|) tokens, so if A and B
    have NO common token among each one's first |set| - ceil(t*|set|)
    + 1 ordered tokens (the 'prefix'), the overlap cannot reach the
    bound — equi-joining on prefix tokens therefore misses no
    qualifying pair, while candidates scale with per-token collision
    lists (rarest tokens first = smallest lists), never n².

    Scale shape: token df is one partial-agg groupBy; the df-order
    rides a broadcast of the (token, df) vocabulary onto the
    exploded tokens; candidates are keys-only through the prefix
    equi-join + distinct, and token arrays re-attach by key in the
    verification join (co-partitioned with the candidate shuffle) so
    array payloads never ride the pair explosion.  Scale probe
    (tools/probe_prefix_filter.py, 100k synthetic Zipf-skewed sets,
    local[32]): 43.0M candidates vs 5.0B possible pairs — a 116x cut
    from blocking alone, 26s end-to-end; on a realistic (larger)
    vocabulary the prefix tokens are rarer and the cut deepens.  The ceil() rides
    a 1e-9 guard: 0.6*5 in binary floats is 3.0000000000000004 and a
    naive ceil would silently shorten the prefix below the
    completeness bound."""
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.array_distinct(F.split("p_name", " ")).alias("toks")
    )
    tok = parts.select("p_partkey", F.explode("toks").alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("df"))
    ordered = (
        tok.join(F.broadcast(vocab), "tok")
        .groupBy("p_partkey")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("st")
        )
        .select(
            "p_partkey",
            F.transform("st", lambda s: s["tok"]).alias("toks"),
        )
    )
    n = F.size("toks")
    min_overlap = F.ceil(F.lit(_SSJ_T) * n - F.lit(1e-9))
    pref = ordered.select(
        "p_partkey",
        F.explode(
            F.slice("toks", 1, (n - min_overlap + 1).cast("int"))
        ).alias("ptok"),
    )
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.ptok") == F.col("b.ptok"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("pa"),
            F.col("b.p_partkey").alias("pb"),
        )
        .distinct()
    )
    sa = ordered.select(
        F.col("p_partkey").alias("pa"), F.col("toks").alias("ta")
    )
    sb = ordered.select(
        F.col("p_partkey").alias("pb"), F.col("toks").alias("tb")
    )
    verified = cand.join(sa, "pa").join(sb, "pb")
    inter = F.size(F.array_intersect("ta", "tb"))
    jac = inter.cast("double") / (F.size("ta") + F.size("tb") - inter)
    return verified.filter(jac >= _SSJ_T).select(
        "pa", "pb", (F.round(jac - 1e-9, 4) + F.lit(0.0)).alias("jaccard")
    )


_BLOOM_BITS = 1 << 17  # m bits, packed DENSE as m/64 = 2048 longs (16 KB)
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_PRICE = 400_000.0  # build-side predicate: top-tier orders


@register(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT l.l_orderkey, o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)) - 1e-9, 4)
             + 0.0 AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > {_BLOOM_PRICE}
    GROUP BY l.l_orderkey, o.o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join: a Bloom filter built from the SELECTIVE
    side's join keys prunes the fact-table probe BEFORE its shuffle.
    Spark applies this internally (spark.sql.optimizer.runtime.
    bloomFilter) but exposes no SQL surface for it in this build, so
    the filter is constructed explicitly: each build key sets bit
    h(k) mod m in an m={_BLOOM_BITS}-bit space packed as a
    DENSE array of {_BLOOM_WORDS} longs (a one-hash Bloom).  Dense
    matters: Spark's element_at on a runtime MapType is a LINEAR
    key scan, which made a map-packed filter O(|map|) per probe row
    (measured 7.9 s at sf0.1); positional element_at on an array is
    O(1) and the probe drops to join-dominated cost.  The array is a
    1-row aggregate — broadcast to every probe task, where
    membership is one hash + one map lookup + one bit test, all
    codegen.  False positives pass the prefilter and die in the
    exact join that follows, so the ORACLE IS THE PLAIN JOIN —
    the Bloom changes the physics, never the result.

    Crossover honesty (measured at sf0.1, local[32]): here the
    filtered build side is small enough that AQE broadcasts the
    exact join anyway, so the Bloom adds ~0.7 s of pure overhead
    (1.1 s vs 0.35 s plain) — at this scale you would not deploy it.
    The pattern pays at 100 TB fact-fact scale, where NEITHER side
    broadcasts: the exact join becomes a sort-merge that shuffles
    the full probe side, and the Bloom drops (1 − fill-rate) of
    those rows before the exchange for the price of one fixed-size
    bitmap broadcast.  This query keeps the mechanism exercised and
    differentially correct; the plan-census pin keeps the bitmap
    attach a broadcast."""
    def bucket(col):
        # xxhash64 (native, one codegen call) rather than the repo's
        # md5-derived portable hash: the Bloom never appears in the
        # oracle contract (false positives die in the exact join), so
        # cross-engine hash portability buys nothing and md5 cost per
        # probe row is pure overhead (measured ~0.8 s of the probe
        # pass at sf0.1).  pmod keeps the bucket non-negative.
        return F.pmod(F.xxhash64(col), F.lit(_BLOOM_BITS))

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > _BLOOM_PRICE)
        .select("o_orderkey", "o_orderpriority")
    )
    # sparse (word -> bits) aggregate, then ONE densification pass:
    # the linear map lookups run m/64 times total at build, never per
    # probe row.
    bloom = (
        o.select(bucket(F.col("o_orderkey")).alias("bk"))
        .select(
            F.floor(F.col("bk") / 64).cast("long").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(bk % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word", "bits"))
            ).alias("m")
        )
        .select(
            F.expr(
                f"transform(sequence(0, {_BLOOM_WORDS - 1}), "
                "i -> coalesce(element_at(m, CAST(i AS BIGINT)), "
                "CAST(0 AS BIGINT)))"
            ).alias("bloom")
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    pruned = (
        li.crossJoin(F.broadcast(bloom))
        .withColumn("bk", bucket(F.col("l_orderkey")))
        .filter(
            F.expr(
                "(shiftright("
                "element_at(bloom, CAST(floor(bk / 64) AS INT) + 1),"
                " CAST(bk % 64 AS INT)) & 1) = 1"
            )
        )
        .drop("bloom", "bk")
    )
    return (
        pruned.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            (
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    - 1e-9,
                    4,
                )
                + 0.0
            ).alias("revenue")
        )
    )


_FUZZY_MAX_EDIT = 3


@register(
    "join_fuzzy_entity_resolution",
    oracle=f"""
    WITH t AS (
      SELECT p_partkey, p_name,
             string_split(p_name, ' ')[1] AS tok1, p_size
      FROM part
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM t a JOIN t b
      ON a.tok1 = b.tok1 AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_EDIT}
    """,
)
def join_fuzzy_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by BLOCKED fuzzy matching: candidate pairs
    come only from shared blocking keys (first name token × size),
    then survive an edit-distance verify (levenshtein ≤
    {_FUZZY_MAX_EDIT}).  The record-linkage fundamental: the
    all-pairs O(n²) comparison never materializes — blocking is one
    equi-join on a derived key, so candidates are sum-of-C(block,2),
    and the expensive string metric runs ONLY on candidates, as a
    codegen expression (Spark's built-in levenshtein, no UDF).

    At 100 TB block sizes decide everything: a production blocker
    layers several cheap keys (phonetic code, sorted-token prefix,
    length bucket) and unions candidates — the pigeonhole multi-index
    idea dedup_simhash_pairs uses, applied to strings.  Skewed
    blocks (one giant token) split under AQE skew handling or an
    added secondary key."""
    t = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.split(F.col("p_name"), " ").getItem(0).alias("tok1"),
        "p_size",
    )
    a, b = t.alias("a"), t.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.tok1") == F.col("b.tok1"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(dist <= _FUZZY_MAX_EDIT)
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            dist.alias("edit_dist"),
        )
    )


@register(
    "join_cardinality_estimate",
    oracle="""
    WITH h AS (
      SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c * c) AS BIGINT) AS exact_join_rows,
           round(CAST(sum(c) AS DOUBLE) * sum(c) / count(*)
                 - 1e-9, 4) + 0.0 AS uniform_est_rows,
           (SELECT max(k) FROM h
            WHERE c = (SELECT max(c) FROM h)) AS top_key,
           CAST(max(c) * max(c) AS BIGINT) AS top_key_pairs,
           round(CAST(max(c) * max(c) AS DOUBLE)
                 / (sum(c * c) / count(*)) - 1e-9, 4) + 0.0
             AS skew_ratio
    FROM h
    """,
)
def join_cardinality_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Join-size estimation WITHOUT running the join — the planner
    arithmetic behind every broadcast/salt/skew decision in this
    engine.  For the self-equi-join `lineitem ⋈ lineitem ON
    l_partkey` (the shape under market-basket and set-similarity
    pair generation): exact output cardinality Σ c_k² from the key
    histogram, the uniform-assumption estimate n²/d a naive
    optimizer would use, the single heaviest key's pair count, and
    the skew ratio (top key's pairs vs the mean per-key pairs) —
    the number that says 'salt this key' before any shuffle is paid.

    Scale shape: ONE partial-agg groupBy collapses the fact table to
    its key histogram (d rows), then a 1-row aggregate over the
    histogram — the estimate costs O(|fact|) map-side work and never
    materializes a pair.  All outputs exact integer arithmetic
    except the two declared-double ratios; top-key ties break on the
    (count, key) struct order, so the row is engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count("*").alias("c")
    )
    c, k = F.col("c"), F.col("k")
    return h.agg(
        F.sum(c).cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.sum(c * c).cast("long").alias("exact_join_rows"),
        (
            F.round(
                F.sum(c).cast("double") * F.sum(c) / F.count("*") - 1e-9, 4
            )
            + 0.0
        ).alias("uniform_est_rows"),
        F.max_by(k, F.struct(c, k)).alias("top_key"),
        (F.max(c) * F.max(c)).cast("long").alias("top_key_pairs"),
        (
            F.round(
                (F.max(c) * F.max(c)).cast("double")
                / (F.sum(c * c) / F.count("*"))
                - 1e-9,
                4,
            )
            + 0.0
        ).alias("skew_ratio"),
    )
