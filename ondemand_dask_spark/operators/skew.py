"""Skew mitigation (SURVEY §4 / the 100 TB posture).

AQE's runtime skew-join splitting is the first line of defense and is
on by default (session.py).  These helpers are the EXPLICIT levers
for the cases AQE cannot fix:

- `salted_agg`: hot grouping keys (one user = 20% of events) make one
  reducer the straggler.  Two-phase aggregation — partial groupBy on
  (key, salt), final groupBy on (key) — caps any single task at
  1/buckets of the hot key.  Only decomposable aggregates qualify
  (sum/count/min/max, and avg via sum+count); the helper exposes
  exactly those.
- `salted_join`: a shuffle join whose LEFT key is skewed.  Left rows
  get a deterministic salt in [0, buckets); the right side is
  replicated `buckets`× with an exploded salt column; the join runs
  on (key, salt) so the hot key spreads over `buckets` tasks.  Right
  replication cost = |right| × buckets — use when right is the small
  (but above-broadcast-threshold) side.

Both produce results identical to their unsalted forms — asserted by
differential tests — because salting only re-routes rows, never
changes grouping/join semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}
_FINAL = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing
    "min": F.min,
    "max": F.max,
}


def _salt(cols: list[str], buckets: int) -> Column:
    """Deterministic salt from the row's own values — stable across
    retries/speculative tasks (rand() is not)."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    aggs: output_name -> (fn, column), fn in sum/count/min/max.
    avg: request sum+count and divide afterwards.
    """
    bad = [fn for fn, _ in aggs.values() if fn not in _PARTIAL]
    if bad:
        raise ValueError(f"non-decomposable agg(s) for salting: {bad}")
    salt_cols = salt_from or [c for c in df.columns if c not in keys]
    salted = df.withColumn("__salt", _salt(salt_cols, buckets))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_PARTIAL[fn](col).alias(name) for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_FINAL[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt left, replicate right ×buckets,
    join on (key..., salt)."""
    on_list = [on] if isinstance(on, str) else list(on)
    l_salted = left.withColumn(
        "__salt", _salt([c for c in left.columns], buckets)
    )
    r_replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return l_salted.join(r_replicated, [*on_list, "__salt"], how).drop("__salt")
