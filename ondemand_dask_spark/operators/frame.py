"""OnDemandFrame — a Dask-DataFrame-style façade over pyspark.sql.

The reference's users write `dd.read_parquet(...).merge(...).groupby
(...).agg(...).compute()`.  This wrapper lets that code port almost
verbatim while every call lowers to the idiomatic Spark DataFrame
expression (SURVEY §2's mappings) — Catalyst sees only declarative
plans, so pushdown/pruning/broadcast/AQE all still apply.  It is a
thin veneer: `.to_spark()` is always available and zero-cost.

Deviations from pandas, by design (SURVEY §7 hard parts):
- SQL NULL semantics, never NaN quirks;
- no implicit index: `set_index` records a sort/partition layout
  (range-partitioned, sorted within partitions) but keys stay
  ordinary columns;
- `first/last`-style order-dependent ops require an explicit order.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ondemand_dask_spark.operators import asof as _asof

_AGG_MAP: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "nunique": F.countDistinct,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "prod": F.product,
    "median": F.median,
    "any": lambda c: F.max(F.col(c).cast("boolean")),
    "all": lambda c: F.min(F.col(c).cast("boolean")),
    "list": F.collect_list,
    "set": F.collect_set,
}


def from_spark(df: DataFrame) -> "OnDemandFrame":
    return OnDemandFrame(df)


def read_parquet(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> "OnDemandFrame":
    """dd.read_parquet — `columns=` kept for API parity; Catalyst
    prunes automatically, the explicit select only documents intent."""
    df = spark.read.parquet(path)
    return OnDemandFrame(df.select(*columns) if columns else df)


class OnDemandFrame:
    def __init__(self, df: DataFrame):
        self._df = df

    # -- plumbing ---------------------------------------------------------
    def to_spark(self) -> DataFrame:
        return self._df

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    def _wrap(self, df: DataFrame) -> "OnDemandFrame":
        return OnDemandFrame(df)

    def __repr__(self) -> str:  # pragma: no cover
        return f"OnDemandFrame[{', '.join(self._df.columns)}]"

    # -- projection / mutation (§2.B) ------------------------------------
    def __getitem__(self, key):
        if isinstance(key, Column):  # boolean mask → filter
            return self._wrap(self._df.filter(key))
        if isinstance(key, list):
            return self._wrap(self._df.select(*key))
        return self._df[key]  # column name → Column (expression building)

    def assign(self, **kwargs) -> "OnDemandFrame":
        cols = {
            k: (v(self) if callable(v) else v) for k, v in kwargs.items()
        }
        return self._wrap(self._df.withColumns(cols))

    def drop(self, columns: Iterable[str]) -> "OnDemandFrame":
        return self._wrap(self._df.drop(*columns))

    def rename(self, columns: dict[str, str]) -> "OnDemandFrame":
        return self._wrap(self._df.withColumnsRenamed(columns))

    def astype(self, dtypes: dict[str, str]) -> "OnDemandFrame":
        return self._wrap(
            self._df.withColumns(
                {c: F.col(c).cast(t) for c, t in dtypes.items()}
            )
        )

    def query(self, expr: str) -> "OnDemandFrame":
        return self._wrap(self._df.filter(expr))

    def where(self, cond: Column, other) -> "OnDemandFrame":
        """pandas .where: keep values where cond, else `other`."""
        return self._wrap(
            self._df.withColumns(
                {
                    c: F.when(cond, F.col(c)).otherwise(F.lit(other))
                    for c in self._df.columns
                }
            )
        )

    def dropna(
        self, how: str = "any", subset: list[str] | None = None
    ) -> "OnDemandFrame":
        return self._wrap(self._df.na.drop(how=how, subset=subset))

    def fillna(self, value) -> "OnDemandFrame":
        return self._wrap(self._df.na.fill(value))

    def replace(self, to_replace, value) -> "OnDemandFrame":
        return self._wrap(self._df.na.replace(to_replace, value))

    def sample(self, frac: float, random_state: int = 0) -> "OnDemandFrame":
        return self._wrap(self._df.sample(fraction=frac, seed=random_state))

    def isin_filter(self, col: str, values: Iterable) -> "OnDemandFrame":
        return self._wrap(self._df.filter(F.col(col).isin(*values)))

    def clip(
        self, columns: Iterable[str], lower=None, upper=None
    ) -> "OnDemandFrame":
        """df.clip(lower, upper) over the named columns — pure codegen.

        NULLs pass through untouched (pandas keeps NaN in clip);
        Spark's greatest/least SKIP nulls, which would otherwise turn
        a NULL value into the bound itself, so the null case is
        guarded explicitly."""

        def clipped(c: str) -> Column:
            expr = F.col(c)
            if lower is not None:
                expr = F.greatest(expr, F.lit(lower))
            if upper is not None:
                expr = F.least(expr, F.lit(upper))
            return F.when(F.col(c).isNull(), F.lit(None)).otherwise(expr)

        return self._wrap(
            self._df.withColumns({c: clipped(c) for c in columns})
        )

    def round(self, decimals: dict[str, int]) -> "OnDemandFrame":
        """df.round({col: ndigits}) — per-column rounding."""
        return self._wrap(
            self._df.withColumns(
                {c: F.round(F.col(c), n) for c, n in decimals.items()}
            )
        )

    def unique(self, col: str) -> "OnDemandFrame":
        """ser.unique() — distinct values of one column (one shuffle
        on that column only; projection prunes before the exchange)."""
        return self._wrap(self._df.select(col).distinct())

    def between_filter(self, col: str, left, right) -> "OnDemandFrame":
        """ser.between(left, right) as a filter — inclusive bounds."""
        return self._wrap(self._df.filter(F.col(col).between(left, right)))

    def rank(
        self, col: str, method: str = "min", ascending: bool = True
    ) -> Column:
        """ser.rank(method='min'|'dense') over the whole frame.

        Returns the window COLUMN (compose with assign).  Global
        window — the bounded-input exception; for data-sized frames
        use operators/rank.py's two-pass global_row_numbers."""
        order = F.asc(col) if ascending else F.desc(col)
        w = Window.orderBy(order)
        return (F.rank() if method == "min" else F.dense_rank()).over(w)

    # -- joins / concat (§2.C, §2.G) --------------------------------------
    def merge(
        self,
        right: "OnDemandFrame",
        on: str | list[str] | None = None,
        how: str = "inner",
        indicator: bool = False,
        broadcast: bool = False,
        left_on: str | list[str] | None = None,
        right_on: str | list[str] | None = None,
        suffixes: tuple[str, str] = ("_x", "_y"),
    ) -> "OnDemandFrame":
        """dd.merge: inner/left/right/outer plus Spark-native semi/anti.
        `broadcast=True` hints the small side (dimension tables).
        pandas parity: `left_on`/`right_on` join differently-named keys
        (both key columns kept, as pandas does), and clashing non-key
        columns get `suffixes` — Spark would otherwise emit ambiguous
        duplicate names."""
        how = {"outer": "full"}.get(how, how)
        if left_on is not None or right_on is not None:
            lks = [left_on] if isinstance(left_on, str) else list(left_on)
            rks = [right_on] if isinstance(right_on, str) else list(right_on)
            lt, rt = self._df, right._df
            clash = (set(lt.columns) & set(rt.columns)) - (set(lks) & set(rks))
            lt = lt.withColumnsRenamed({c: c + suffixes[0] for c in clash})
            rt = rt.withColumnsRenamed({c: c + suffixes[1] for c in clash})
            lks = [k + suffixes[0] if k in clash else k for k in lks]
            rks = [k + suffixes[1] if k in clash else k for k in rks]
            cond = None
            for lk, rk in zip(lks, rks):
                c = lt[lk] == rt[rk]
                cond = c if cond is None else cond & c
            return self._wrap(
                lt.join(F.broadcast(rt) if broadcast else rt, cond, how)
            )
        on_list = [on] if isinstance(on, str) else list(on)
        lt, r = self._df, right._df
        clash = (set(lt.columns) & set(r.columns)) - set(on_list)
        if clash:
            lt = lt.withColumnsRenamed({c: c + suffixes[0] for c in clash})
            r = r.withColumnsRenamed({c: c + suffixes[1] for c in clash})
        if indicator:
            ltag = lt.withColumn("__l", F.lit(1))
            rt = r.withColumn("__r", F.lit(1))
            j = ltag.join(F.broadcast(rt) if broadcast else rt, on_list, "full")
            merge_col = (
                F.when(F.col("__l").isNull(), "right_only")
                .when(F.col("__r").isNull(), "left_only")
                .otherwise("both")
            )
            return self._wrap(
                j.withColumn("_merge", merge_col).drop("__l", "__r")
            )
        return self._wrap(
            lt.join(F.broadcast(r) if broadcast else r, on_list, how)
        )

    def merge_asof(self, right: "OnDemandFrame", **kwargs) -> "OnDemandFrame":
        return self._wrap(_asof.merge_asof(self._df, right._df, **kwargs))

    def concat(self, other: "OnDemandFrame") -> "OnDemandFrame":
        """dd.concat(axis=0): union by name with schema union."""
        return self._wrap(
            self._df.unionByName(other._df, allowMissingColumns=True)
        )

    # -- groupby (§2.D) ---------------------------------------------------
    def groupby(self, by: str | list[str]) -> "OnDemandGroupBy":
        return OnDemandGroupBy(self, [by] if isinstance(by, str) else list(by))

    def drop_duplicates(
        self,
        subset: list[str] | None = None,
        keep_order: list[Column] | None = None,
    ) -> "OnDemandFrame":
        """keep='first' needs an explicit order (keep_order) — the
        unordered variant maps to dropDuplicates."""
        if keep_order is None:
            return self._wrap(self._df.dropDuplicates(subset))
        w = Window.partitionBy(*(subset or self._df.columns)).orderBy(*keep_order)
        return self._wrap(
            self._df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def value_counts(self, col: str) -> "OnDemandFrame":
        return self._wrap(
            self._df.groupBy(col).count().orderBy(F.desc("count"), col)
        )

    def describe(self, *cols: str) -> "OnDemandFrame":
        return self._wrap(self._df.select(*cols).summary())

    def melt(
        self, id_vars: list[str], value_vars: list[str]
    ) -> "OnDemandFrame":
        return self._wrap(
            self._df.melt(id_vars, value_vars, "variable", "value")
        )

    def pivot_table(
        self, index: str, columns: str, values: str, aggfunc: str = "sum"
    ) -> "OnDemandFrame":
        return self._wrap(
            self._df.groupBy(index)
            .pivot(columns)
            .agg(_AGG_MAP[aggfunc](values))
        )

    # -- ordered analytics (§2.E/§2.F) ------------------------------------
    def sort_values(
        self, by: str | list[str], ascending: bool = True
    ) -> "OnDemandFrame":
        cols = [by] if isinstance(by, str) else list(by)
        return self._wrap(
            self._df.orderBy(*[F.asc(c) if ascending else F.desc(c) for c in cols])
        )

    def nlargest(self, n: int, col: str) -> "OnDemandFrame":
        return self._wrap(self._df.orderBy(F.desc(col)).limit(n))

    def nsmallest(self, n: int, col: str) -> "OnDemandFrame":
        return self._wrap(self._df.orderBy(F.asc(col)).limit(n))

    def shift(
        self, col: str, periods: int, order_by: list[str], partition_by: list[str]
    ) -> Column:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
        return F.lag(col, periods).over(w) if periods > 0 else F.lead(
            col, -periods
        ).over(w)

    def rolling(
        self, window: int, order_by: list[str], partition_by: list[str]
    ) -> "OnDemandRolling":
        return OnDemandRolling(self, window, order_by, partition_by)

    def expanding(
        self, order_by: list[str], partition_by: list[str]
    ) -> "OnDemandRolling":
        """df.expanding() — unbounded-preceding frame (cumsum/cummax/
        cumcount are `expanding(...).sum/max/count`)."""
        return OnDemandRolling(self, None, order_by, partition_by)

    def resample(self, rule: str, on: str) -> "OnDemandResample":
        """df.resample('1D', on=ts) — time-bucket regrouping; agg()
        downsamples via date_trunc (a plain hash aggregate)."""
        return OnDemandResample(self, rule, on)

    def nunique(self, col: str) -> "OnDemandFrame":
        """ser.nunique — exact distinct count (one row)."""
        return self._wrap(
            self._df.agg(F.countDistinct(col).alias(f"{col}_nunique"))
        )

    def quantile(self, col: str, q: float | list[float]) -> "OnDemandFrame":
        """ser.quantile — approximate by default, matching Dask's
        t-digest semantics (`percentile_approx` sketch: single pass,
        mergeable, fixed memory).  Exact grouped quantiles live in
        operators/quantile.py."""
        qs = [q] if isinstance(q, float) else list(q)
        out = self._df.agg(
            F.percentile_approx(
                col, F.array(*[F.lit(x) for x in qs]), 10000
            ).alias("qs")
        )
        return self._wrap(
            out.select(
                *[
                    F.element_at("qs", i + 1).alias(f"{col}_q{str(x).replace('.', '_')}")
                    for i, x in enumerate(qs)
                ]
            )
        )

    def explode(self, col: str) -> "OnDemandFrame":
        """ser.explode — one row per array element, other columns
        repeated (a narrow op; no shuffle)."""
        others = [c for c in self._df.columns if c != col]
        return self._wrap(self._df.select(*others, F.explode(col).alias(col)))

    def cov(self, a: str, b: str) -> "OnDemandFrame":
        return self._wrap(self._df.agg(F.covar_samp(a, b).alias("cov")))

    def corr(self, a: str, b: str) -> "OnDemandFrame":
        return self._wrap(self._df.agg(F.corr(a, b).alias("corr")))

    def ffill(
        self, col: str, order_by: list[str], partition_by: list[str]
    ) -> Column:
        """ser.ffill — carry the last non-null observation forward."""
        w = (
            Window.partitionBy(*partition_by)
            .orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last(col, ignorenulls=True).over(w)

    def bfill(
        self, col: str, order_by: list[str], partition_by: list[str]
    ) -> Column:
        """ser.bfill — carry the next non-null observation backward."""
        w = (
            Window.partitionBy(*partition_by)
            .orderBy(*order_by)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        return F.first(col, ignorenulls=True).over(w)

    def pct_change(
        self, col: str, order_by: list[str], partition_by: list[str]
    ) -> Column:
        """ser.pct_change — relative step vs the previous row per key."""
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
        return F.col(col) / F.lag(col).over(w) - 1

    def set_index(self, col: str, npartitions: int | None = None) -> "OnDemandFrame":
        """Range-partition + sort on `col` — Dask's set_index with
        known divisions.  Downstream merges/windows on `col` reuse the
        layout (no re-shuffle) exactly like aligned divisions."""
        df = (
            self._df.repartitionByRange(npartitions, col)
            if npartitions
            else self._df.repartitionByRange(col)
        )
        return self._wrap(df.sortWithinPartitions(col))

    # -- escape hatches (§2.J) --------------------------------------------
    def map_partitions(self, fn, schema: str) -> "OnDemandFrame":
        return self._wrap(self._df.mapInPandas(fn, schema))

    # -- physical / actions (§2.A) ----------------------------------------
    def repartition(self, npartitions: int) -> "OnDemandFrame":
        return self._wrap(self._df.repartition(npartitions))

    def persist(self) -> "OnDemandFrame":
        return self._wrap(self._df.persist())

    def compute(self) -> pd.DataFrame:
        return self._df.toPandas()

    def head(self, n: int = 5) -> pd.DataFrame:
        return self._df.limit(n).toPandas()

    def tail(self, n: int = 5) -> pd.DataFrame:
        return pd.DataFrame(
            [r.asDict() for r in self._df.tail(n)], columns=self._df.columns
        )

    def to_parquet(self, path: str, partition_on: list[str] | None = None) -> None:
        w = self._df.write.mode("overwrite")
        if partition_on:
            w = w.partitionBy(*partition_on)
        w.parquet(path)


class OnDemandGroupBy:
    def __init__(self, frame: OnDemandFrame, keys: list[str]):
        self._frame = frame
        self._keys = keys

    def agg(self, spec: dict[str, str | list[str]]) -> OnDemandFrame:
        """pandas-style {'col': 'sum'} / {'col': ['sum','mean']} —
        outputs named col_fn (dask's flattened MultiIndex)."""
        exprs = []
        for col, fns in spec.items():
            for fn in [fns] if isinstance(fns, str) else fns:
                exprs.append(_AGG_MAP[fn](col).alias(f"{col}_{fn}"))
        return self._frame._wrap(
            self._frame._df.groupBy(*self._keys).agg(*exprs)
        )

    def __getattr__(self, fn: str):
        if fn not in _AGG_MAP:
            raise AttributeError(fn)

        def all_cols() -> OnDemandFrame:
            others = [
                c for c in self._frame._df.columns if c not in self._keys
            ]
            return self.agg({c: fn for c in others})

        return all_cols

    def size(self) -> OnDemandFrame:
        return self._frame._wrap(
            self._frame._df.groupBy(*self._keys).agg(F.count("*").alias("size"))
        )

    def apply(self, fn, schema: str) -> OnDemandFrame:
        return self._frame._wrap(
            self._frame._df.groupBy(*self._keys).applyInPandas(fn, schema)
        )

    def transform(self, col: str, fn: str) -> Column:
        """Per-group agg broadcast back to rows (window, no shuffle of
        results back through a join)."""
        w = Window.partitionBy(*self._keys)
        return _AGG_MAP[fn](col).over(w)


class OnDemandRolling:
    def __init__(
        self,
        frame: OnDemandFrame,
        window: int | None,
        order_by: list[str],
        partition_by: list[str],
    ):
        self._frame = frame
        lo = Window.unboundedPreceding if window is None else -(window - 1)
        self._w = (
            Window.partitionBy(*partition_by)
            .orderBy(*order_by)
            .rowsBetween(lo, 0)
        )

    def __getattr__(self, fn: str):
        if fn not in _AGG_MAP:
            raise AttributeError(fn)

        def over(col: str) -> Column:
            return _AGG_MAP[fn](col).over(self._w)

        return over


_RULE_MAP = {
    "1D": "day", "D": "day",
    "1H": "hour", "H": "hour", "h": "hour",
    "1W": "week", "W": "week",
    "1M": "month", "M": "month", "MS": "month",
    "1T": "minute", "T": "minute", "min": "minute",
}


class OnDemandResample:
    """df.resample(rule, on=ts).agg({...}) — downsampling to calendar
    buckets.  date_trunc keeps the bucket key a plain column, so the
    aggregate is an ordinary partial+final hash agg (no windowing)."""

    def __init__(self, frame: OnDemandFrame, rule: str, on: str):
        if rule not in _RULE_MAP:
            raise ValueError(f"unsupported resample rule {rule!r}")
        self._frame = frame
        self._bucket = F.date_trunc(_RULE_MAP[rule], F.col(on)).alias(on)
        self._on = on

    def agg(self, spec: dict[str, str | list[str]]) -> OnDemandFrame:
        exprs = []
        for col, fns in spec.items():
            for fn in [fns] if isinstance(fns, str) else fns:
                exprs.append(_AGG_MAP[fn](col).alias(f"{col}_{fn}"))
        return self._frame._wrap(
            self._frame._df.groupBy(self._bucket).agg(*exprs)
        )

    def size(self) -> OnDemandFrame:
        return self._frame._wrap(
            self._frame._df.groupBy(self._bucket).agg(F.count("*").alias("size"))
        )
