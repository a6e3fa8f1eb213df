"""merge_asof — the reference's as-of join as a reusable operator.

Semantics follow pandas/Dask `merge_asof(left, right, on=, by=,
direction=, tolerance=)`: for each left row, pick the single right
row with the closest `on` value at-or-before it (backward), at-or-
after it (forward), or whichever is nearer (nearest), optionally
within the same `by` group and within `tolerance`.

Implementation (SURVEY §2.C): no native batch primitive exists, and
cross-join+argmax is quadratic.  We union the tagged inputs, sort by
(`by`, `on`) inside one window shuffle, and carry the latest right
payload forward with `last(..., ignorenulls=True)` — O((|L|+|R|)
log(partition)) with exactly one shuffle on `by`, the same cost
shape as a sort-merge join, so it scales to 100 TB (partition count
follows the `by` cardinality; a missing `by` collapses to one sorted
partition and is rejected unless `allow_global=True`).

Unmatched left rows keep NULL right columns (pandas semantics: the
join is left by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _carry(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    payload: list[str],
    *,
    forward: bool,
    suffix: str,
) -> DataFrame:
    """One directional pass; returns left rows + carried payload."""
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__prio"),
        F.col(on).alias(f"__r_{on}"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    )
    l_cols = [c for c in left.columns]
    l = left.select(
        *l_cols,
        F.lit(1).alias("__prio"),
        F.lit(None).cast(right.schema[on].dataType).alias(f"__r_{on}"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in payload
        ],
    )
    # Right rows sort before left at equal `on` so ties match
    # (>= / <= semantics, as pandas).
    order = (
        [F.desc(on), F.asc("__prio")] if forward else [F.asc(on), F.asc("__prio")]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in [on, *payload]
    ]
    u = r.unionByName(l, allowMissingColumns=True).select(
        *l_cols, "__prio", *carried
    )
    return u.filter(F.col("__prio") == 1).drop("__prio")


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
    allow_global: bool = False,
) -> DataFrame:
    """As-of join `left` to `right` on the ordered column `on`.

    Right columns (except `on`/`by`) come back suffixed; unmatched
    left rows keep NULLs.  `tolerance_seconds` bounds |left.on -
    right.on| (timestamp or numeric `on`).  `direction` ∈ backward /
    forward / nearest.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction: {direction}")
    by_list = [by] if isinstance(by, str) else list(by or [])
    if not by_list and not allow_global:
        raise ValueError(
            "merge_asof without `by` sorts globally in one partition; "
            "pass allow_global=True if that is intended"
        )
    payload = [c for c in right.columns if c != on and c not in by_list]

    def age(matched_on: str):
        lo = F.col(on)
        ro = F.col(matched_on)
        if dict(left.dtypes)[on].startswith("timestamp"):
            return F.abs(
                lo.cast("timestamp").cast("double")
                - ro.cast("timestamp").cast("double")
            )
        return F.abs(lo.cast("double") - ro.cast("double"))

    if direction in ("backward", "forward"):
        out = _carry(
            left, right, on, by_list, payload,
            forward=direction == "forward", suffix=suffix,
        )
        if tolerance_seconds is not None:
            keep = age(f"{on}{suffix}") <= tolerance_seconds
            # outside tolerance → unmatched (NULL payload), not dropped
            out = out.select(
                *left.columns,
                *[
                    F.when(keep, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                    for c in [on, *payload]
                ],
            )
        return out

    # nearest: run both passes, pick the closer match (ties → backward,
    # as pandas).
    b = _carry(left, right, on, by_list, payload, forward=False, suffix="__b")
    f = _carry(left, right, on, by_list, payload, forward=True, suffix="__f")
    joined = b.join(f, on=[*left.columns], how="inner")
    b_age, f_age = age(f"{on}__b"), age(f"{on}__f")
    if tolerance_seconds is not None:
        b_ok = F.col(f"{on}__b").isNotNull() & (b_age <= tolerance_seconds)
        f_ok = F.col(f"{on}__f").isNotNull() & (f_age <= tolerance_seconds)
    else:
        b_ok = F.col(f"{on}__b").isNotNull()
        f_ok = F.col(f"{on}__f").isNotNull()
    take_b = b_ok & (~f_ok | (b_age <= f_age))
    picked = [
        F.when(take_b, F.col(f"{c}__b"))
        .when(f_ok, F.col(f"{c}__f"))
        .alias(f"{c}{suffix}")
        for c in [on, *payload]
    ]
    return joined.select(*left.columns, *picked)
