"""Query registry — the spine of the driver contract.

Every operator the engine implements registers here as a named query:
a Spark callable `(spark, sf_dir) -> DataFrame` plus (when the
semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL.
`__spark_entry__.queries()` / `oracle_sql()` simply read this dict,
and the local test suite runs the same differential comparison the
driver does — so local green means driver green.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query under `name` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# Curated cross-section of the registry, surfaced FIRST by
# all_queries().  A budgeted differential-checking driver that only
# reaches the first N queries should see at least one representative
# of every SURVEY §2 family (sources, relational, joins, aggregations,
# windows, sorts, sets, scalars, asof/composed, UDFs, streaming, and
# each §2.K LLM-pipeline extension) rather than N entries of whichever
# module happens to import first.  Everything not listed follows in
# registration order.
_SHOWCASE: tuple[str, ...] = (
    # tpch goldens
    "tpch_q1", "tpch_q3", "tpch_q6", "tpch_q5",
    # §2.A sources / sinks
    "source_csv_roundtrip", "source_json_roundtrip", "sink_partitioned_parquet",
    # §2.B projections / filters
    "proj_select", "filter_mask",
    # §2.C joins
    "join_inner", "join_left", "join_broadcast", "join_semi", "join_anti",
    # §2.D aggregations (incl. the formerly-red and banded-approx rows)
    "agg_groupby_basic", "agg_groupby_quantile", "stat_crosstab",
    "agg_collect_list_sorted", "stat_freq_items", "agg_nunique_approx",
    "agg_quantile_approx", "agg_hll_sketch_merge",
    # §2.E windows / resample
    "window_cumsum", "window_rank_family", "window_ewm_bounded", "resample_day",
    # §2.F sorts / top-k
    "sort_values_global", "topk_nlargest",
    # §2.G set ops
    "set_union_distinct",
    # §2.H scalar function batteries
    "str_case_len", "dt_trunc_format", "array_basic", "map_functions",
    "json_extract",
    # composed / asof
    "asof_join_backward", "sessionize_gap",
    # §2.J UDF surface
    "udf_pandas_scalar", "udf_grouped_agg",
    # §2.K dedup / similarity / text / pipeline / multimodal
    "dedup_exact", "dedup_minhash_lsh",
    "ann_cosine_topk", "embedding_centroids",
    "text_tfidf_top_term",
    "pipeline_end_to_end", "pipeline_inverted_index",
    "multimodal_dedup_content_hash",
    # §2.I streaming
    "stream_tumbling_agg",
    # incremental / encoding / skew
    "merge_upsert", "encode_one_hot", "join_salted_skew",
)


def all_queries() -> dict[str, Query]:
    _load_all()
    missing = [n for n in _SHOWCASE if n not in _REGISTRY]
    if missing:  # fail loudly — a rename must update the showcase
        raise KeyError(f"showcase names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _SHOWCASE}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (imports trigger registration)."""
    global _LOADED
    if _LOADED:
        return
    import ondemand_dask_spark.queries  # noqa: F401  (side-effect imports)

    _LOADED = True
