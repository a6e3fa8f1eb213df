"""Distributed EXACT grouped quantiles (§2.D).

`F.percentile` (and any ObjectHashAggregate) collects every group
value into one aggregation buffer — at 100 TB a low-cardinality
groupBy means multi-GB buffers on single tasks: the OOM shape.  Two
implementations with the same `quantile_cont` semantics (value at
rank h = (n-1)·q, linearly interpolated between floor(h) and
ceil(h), NULLs ignored):

`exact_group_quantiles` — sort-based.  Rank via `row_number` over a
per-group window (a hash-partitioned sort, no per-task value
collection); group sizes via a plain partial-agg count broadcast
back on; only the ≤ 2·|qs| boundary rows per group survive into the
final aggregation.  One sort shuffle of the (keys, value) pairs;
memory per task O(1).  The right shape when |groups| ≫ cores (the
common 100 TB case: quantiles per tenant / per day) — each group's
sort is one task, and there are plenty.

`exact_group_quantiles_select` — selection-based, for FEW huge
groups where one-task-per-group sorts serialize.  One `approxQuantile`
sketch pass yields ~`buckets` global cutpoints (GK sketch, single
pass, driver receives only the cutpoints); rows get a bucket id from
the broadcast cutpoints (codegen'd comparison chain, no shuffle);
per-(group, bucket) counts — |groups|·|buckets| rows — carry rank
offsets and group sizes via a window over that tiny table only;
buckets containing a target rank floor/ceil((n-1)·q) survive a
broadcast join (~2·|qs|/buckets of the input) and only THEY are
sorted; local rank + bucket offset = exact global rank.  Equal
values always share a bucket, so per-bucket rank concatenation is a
valid global sort order even with ties.  Shuffle cost ≈ 2·|qs|/
buckets of the input instead of all of it; parallelism = groups ×
targeted buckets.  Measured at sf0.1 (600k rows, 3 groups): the
extra scans cost far more than simply sorting — r5 A/B in one warm
local[32] session (tools/ab_quantile.py, best-of-3): sort path
1.47 s, select with GK-sketch cutpoints 9.2 s, select with linear
min/max cutpoints 8.5 s, so even removing the sketch pass does not
rescue it at toy scale.  The crossover is where a group's sort no
longer fits one task, NOT here — the sort path stays the default,
and the r3 'make agg_groupby_quantile ~1.2 s' directive is closed
as machine noise: the same A/B shows the count-window vs count-join
shapes within 10% (1.47 vs 1.43 s), i.e. no re-scan to remove.
r10 re-ran the A/B at sf1 (6M rows, still 3 groups ⇒ 2M-row
single-task sorts, tools/ab_quantile.py best-of-3): sort 13.0 s vs
select 10.9 s — the selection path overtakes exactly where the
theory says (group size ≫ rows/core), confirming the knee is real
and sits near the 4M-row estimate; the registered query keeps
path='sort' because every committed bench SF is below it, and
callers without that prior pay the probe and flip automatically.

Exactness of both is differentially proven by the
`agg_groupby_quantile` oracle query and property-tested against
numpy in tests/test_quantile_property.py.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _h(q: float):
    """Fractional target rank for quantile q, as a column over __n."""
    return (F.col("__n") - 1) * F.lit(float(q))


def _boundary_rows(ranked: DataFrame, keys: list[str], qs: dict[str, float]):
    """Filter to rows at floor/ceil target ranks, aggregate, interpolate."""
    keep = functools.reduce(
        operator.or_,
        [
            (F.col("__rn") == F.floor(_h(q))) | (F.col("__rn") == F.ceil(_h(q)))
            for q in qs.values()
        ],
    )
    aggs = [F.max("__n").alias("__n")]
    for name, q in qs.items():
        aggs.append(
            F.max(F.when(F.col("__rn") == F.floor(_h(q)), F.col("__v"))).alias(
                f"__lo_{name}"
            )
        )
        aggs.append(
            F.max(F.when(F.col("__rn") == F.ceil(_h(q)), F.col("__v"))).alias(
                f"__hi_{name}"
            )
        )
    grouped = ranked.filter(keep).groupBy(*keys).agg(*aggs)
    outs = []
    for name, q in qs.items():
        frac = _h(q) - F.floor(_h(q))
        lo, hi = F.col(f"__lo_{name}"), F.col(f"__hi_{name}")
        outs.append((lo + frac * (hi - lo)).alias(name))
    return grouped.select(*keys, *outs)


def exact_group_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    qs: dict[str, float],
) -> DataFrame:
    """One row per group with a column per requested quantile (sort path).

    qs: output_column_name -> quantile in [0, 1].
    """
    d = df.select(*keys, F.col(col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    return _sort_path(d, None, keys, qs)


def _sort_path(
    d: DataFrame, counts: DataFrame | None, keys: list[str], qs: dict[str, float]
) -> DataFrame:
    # Rank over the __v sort (ties get arbitrary ranks — harmless:
    # interpolating between equal values returns that value).
    w_sort = Window.partitionBy(*keys).orderBy("__v")
    ranked = d.withColumn("__rn", F.row_number().over(w_sort) - 1)
    if counts is None:
        # Group size as a whole-partition window count over the SAME
        # exchange+sort the rank window just planned — one scan, one
        # shuffle, zero joins (measured vs the old count-agg + join
        # shape: one fewer job and ~0.3s off the sf0.1 bench query).
        ranked = ranked.withColumn(
            "__n", F.count("*").over(Window.partitionBy(*keys))
        )
    else:
        # Auto-dispatch probe already materialized (and cached) the
        # per-group counts — reuse them.  No forced broadcast on the
        # join: counts has one row PER GROUP, unbounded at scale — a
        # broadcast hint would collect it to the driver regardless of
        # size.  AQE converts to broadcast-hash at runtime whenever
        # the measured size is under the threshold (always, at
        # few/moderate group counts), and falls back to a
        # key-shuffled join that is already co-partitioned with the
        # window sort's exchange when groups number in the millions.
        ranked = ranked.join(counts, on=list(keys))
    return _boundary_rows(ranked, keys, qs)


def exact_group_quantiles_ranged(
    df: DataFrame,
    keys: list[str],
    col: str,
    qs: dict[str, float],
    retain=None,
) -> DataFrame:
    """Range-partitioned sort path — parallel in BOTH group regimes.

    The window sort path serializes each group into one task (and
    AQE's size-based coalescing can merge even the |groups| tasks
    into fewer: the r15 sf1 profile measured 13.6 s of a 14.7 s query
    in a SINGLE task, 31 cores idle).  This variant ranks by
    (keys…, value) with the repo's two-phase distributed rank
    (operators/rank.py `global_row_numbers`: range exchange → local
    row numbers → per-partition offsets), so a huge group spans many
    partitions and sorts at cluster width.  Groups are contiguous in
    the (keys…, value) total order, hence
    rank-within-group = global position − min(position) per group;
    the per-group (start, n) table is one partial-agg pass, joined
    back (AQE broadcasts it at low group counts, and at millions of
    groups it is a plain key join — never a forced driver collect).
    Ties in the value get arbitrary ranks, exactly like the window
    path's row_number — interpolating between equal values returns
    that value, so the quantile is unaffected.

    A/B vs the other paths (tools/ab_quantile.py arms, one warm
    session, interleaved best-of-3, generated sf1 = 6M rows in 3
    groups): ranged 3.4 s vs window-sort 16.5 s / select_minmax
    17.0 s / select_sketch 12.9 s; sf0.1 parity (see the r15 entry in
    OPTIMIZATION_r15.md for the committed numbers).
    """
    from ondemand_dask_spark.operators.rank import global_row_numbers

    d = df.select(*keys, F.col(col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    pos = global_row_numbers(
        d, *keys, "__v", col_name="__pos", retain=retain
    )
    grp = pos.groupBy(*keys).agg(
        F.min("__pos").alias("__st"), F.count("*").alias("__n")
    )
    ranked = pos.join(grp, on=list(keys)).withColumn(
        "__rn", F.col("__pos") - F.col("__st")
    )
    return _boundary_rows(ranked, keys, qs)


# A per-group window sort is one task; beyond this many rows in the
# LARGEST group the single-task sort serializes on one core and the
# ranged path's fixed overhead (range exchange + checkpoint + offsets
# join, ~0.4 s measured at sf0.1) pays for itself.  r15 re-derived
# the knee from measurement: largest group 240k rows (sf0.1) → window
# 1.56 s vs ranged 1.99 s; largest group 2.4M rows (generated sf1) →
# window 13.5 s vs ranged 4.5 s.  The crossover sits near 1M rows
# (the old 4M estimate predates the ranged path and was keyed to the
# select path's much larger overhead).
MAX_ROWS_PER_SORT_TASK = 1_000_000


def choose_quantile_path(
    max_group_rows: int, threshold: int = MAX_ROWS_PER_SORT_TASK
) -> str:
    """Pure decision rule: 'sort' (one-task-per-group window sort)
    unless the largest group exceeds what one task should sort, then
    'ranged' (range-partitioned distributed rank — every group sorts
    at cluster width).  Keyed on the MAX group size, not the
    average — quantile cost is gated by the single worst group
    (skew-aware).  r15: the big-group path is 'ranged', not
    'select' — at generated sf1 ranged measured 4.5 s vs
    select_sketch 12.9 / select_minmax 17.0 / window-sort 13.5 s
    (tools/ab_quantile.py); the selection path stays implemented as
    the measured-negative record and for callers that cannot afford
    the ranged path's localCheckpoint pin."""
    return "ranged" if max_group_rows > threshold else "sort"


# The auto probe's counts cache must outlive this call (the returned
# lazy DataFrame reuses it), so it cannot be unpersisted here.  To
# keep a long session running many queries from accumulating retained
# storage blocks, each new probe evicts the previous call's cache —
# at most ONE counts table (|groups| rows) stays resident.
_RETAINED_COUNTS: list[DataFrame] = []


def _retain_counts(counts: DataFrame) -> None:
    while _RETAINED_COUNTS:
        try:
            _RETAINED_COUNTS.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _RETAINED_COUNTS.append(counts)


def exact_group_quantiles_auto(
    df: DataFrame,
    keys: list[str],
    col: str,
    qs: dict[str, float],
    threshold: int = MAX_ROWS_PER_SORT_TASK,
    buckets: int = 64,
    path: str | None = None,
    retain=None,
) -> DataFrame:
    """Exact grouped quantiles with runtime path selection.

    Probes group sizes with the same partial-agg count the sort path
    needs anyway (cached, so choosing 'sort' reuses it — the probe
    adds one tiny aggregate over the counts table, not a rescan), then
    dispatches per `choose_quantile_path`: many-normal-groups → sort
    path; few-huge-groups → ranged path, whose range-partitioned
    distributed rank restores parallelism a 3-group window sort
    can't have.

    path: optional caller hint ('sort' | 'select' | 'ranged') that
    SKIPS the probe job entirely — for callers that already know the
    group-size regime (e.g. a fixed low-cardinality key over a table
    whose scale band is known).  The probe is one scalar-only
    blocking action; cheap absolutely, but a measurable fraction of
    small queries.

    retain: forwarded to the ranged path's localCheckpoint pin (a
    module's RetainedCaches.retain) so its blocks release at the
    module's next query entry."""
    if path is not None:
        if path == "select":
            return exact_group_quantiles_select(df, keys, col, qs, buckets)
        if path == "ranged":
            return exact_group_quantiles_ranged(
                df, keys, col, qs, retain=retain
            )
        return exact_group_quantiles(df, keys, col, qs)
    d = df.select(*keys, F.col(col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    counts = d.groupBy(*keys).agg(F.count("*").alias("__n")).cache()
    row = counts.agg(F.max("__n").alias("mx")).first()
    mx = int(row["mx"]) if row and row["mx"] is not None else 0
    if choose_quantile_path(mx, threshold) == "ranged":
        counts.unpersist()
        return exact_group_quantiles_ranged(df, keys, col, qs, retain=retain)
    # sort path reuses the cached counts the probe just materialized
    _retain_counts(counts)
    return _sort_path(d, counts, keys, qs)


def exact_group_quantiles_select(
    df: DataFrame,
    keys: list[str],
    col: str,
    qs: dict[str, float],
    buckets: int = 64,
    cuts_from: str = "minmax",
) -> DataFrame:
    """Selection-based variant for few huge groups (see module doc).

    buckets: value-range fan-out; higher = less data sorted but more
    count rows (|groups|·|buckets|) in the routing table.

    cuts_from: how the routing cutpoints are produced — they only
    route ranks to buckets, NEVER affect the exact result, so the
    cheapest adequate strategy wins:
      'minmax' (default) — linear buckets between the global min/max
        from one partial-agg scan.  A/B at sf0.1 (tools/ab_quantile
        .py, one warm session, best-of-3): 0.86 s vs 1.61 s for the
        sort path and ~4 s for the sketch variant — the GK sketch
        pass cost more than it saved.  Value skew only unbalances
        bucket SIZES (cost), not correctness; a pathological
        all-one-value column degrades to the sort path's shape.
      'sketch' — equi-depth cutpoints via approxQuantile; pays a GK
        sketch pass to guarantee balanced buckets.  The right call
        when the value distribution is so skewed that linear buckets
        would funnel a target rank into a near-full bucket.
    """
    d = df.select(*keys, F.col(col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    # 1. global cutpoints (approximation only routes ranks to
    # buckets; it never affects the exact result).
    if cuts_from == "minmax":
        row = d.agg(F.min("__v").alias("lo"), F.max("__v").alias("hi")).first()
        lo = row["lo"] if row and row["lo"] is not None else 0.0
        hi = row["hi"] if row and row["hi"] is not None else 0.0
        if hi > lo:
            step = (hi - lo) / buckets
            cuts = [lo + i * step for i in range(1, buckets)]
        else:  # empty input or single distinct value — one bucket
            cuts = []
    else:
        probs = [i / buckets for i in range(1, buckets)]
        cuts = sorted(
            set(d.stat.approxQuantile("__v", probs, 1.0 / (2 * buckets)))
        )

    # 2. bucket id = #cutpoints below the value (codegen'd int adds).
    if cuts:
        bucket = functools.reduce(
            operator.add,
            [(F.col("__v") > F.lit(c)).cast("int") for c in cuts],
        )
    else:  # empty input or single distinct value — one bucket
        bucket = F.lit(0)
    db = d.withColumn("__b", bucket)

    # 3. per-(group, bucket) counts; offsets + group size via a window
    # over this small table only.
    wb = Window.partitionBy(*keys).orderBy("__b")
    bc = (
        db.groupBy(*keys, "__b")
        .agg(F.count("*").alias("__cnt"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__cnt").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("__n", F.sum("__cnt").over(Window.partitionBy(*keys)))
    )

    # 4. keep only buckets holding a target rank.
    def _in_bucket(rank):
        return (rank >= F.col("__off")) & (rank < F.col("__off") + F.col("__cnt"))

    is_target = functools.reduce(
        operator.or_,
        [
            _in_bucket(F.floor(_h(q))) | _in_bucket(F.ceil(_h(q)))
            for q in qs.values()
        ],
    )
    targets = bc.filter(is_target).select(*keys, "__b", "__off", "__n")
    narrowed = db.join(F.broadcast(targets), on=[*keys, "__b"])

    # 5. exact global rank inside the targeted buckets only.
    w_sort = Window.partitionBy(*keys, "__b").orderBy("__v")
    ranked = narrowed.withColumn(
        "__rn", F.col("__off") + F.row_number().over(w_sort) - 1
    )
    return _boundary_rows(ranked, keys, qs)
