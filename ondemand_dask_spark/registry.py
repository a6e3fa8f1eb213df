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
    # --- round-4 rotation: the driver checks only this 50-entry
    # prefix per round, so each round's window keeps a handful of
    # anchors for continuity and fills the rest with entries that
    # have never earned a driver CORRECTNESS row (r1-r3 covered 89
    # of 260; this window adds 41 first-time checks).
    #
    # anchors (driver-green r3, kept as cross-round continuity +
    # the formerly-red pipeline_end_to_end whose oracle-typing fix
    # must now prove green under the real driver)
    "tpch_q1", "tpch_q3",
    "join_inner", "agg_groupby_basic", "agg_groupby_quantile",
    "window_cumsum", "dedup_minhash_lsh", "pipeline_end_to_end",
    # tpch goldens never driver-checked (best composition detectors)
    "tpch_q2", "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10",
    "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20",
    "tpch_q21", "tpch_q22",
    # §2.I streaming — the distinctive stateful rows
    "stream_session_window", "stream_dedup_watermark",
    # the int-vs-float oracle-drift class fixed this round: earn
    # driver rows for every member so the fix is externally verified
    "checksum_buckets", "dedup_simhash", "json_corrupt_tolerant",
    "math_basic", "pipeline_mixture_sample", "source_text_lines",
    "text_token_count", "pipeline_pack_sequences",
    # dedup scale-shape fixes landing this round
    "dedup_simhash_pairs", "dedup_ngram_jaccard",
    # joins never driver-checked (incl. the bucketed range plans)
    "join_range_bucketed", "join_interval", "join_null_safe",
    # one never-checked representative per remaining §2 family
    "filter_query_string",      # relational
    "encode_feature_hash",      # encoding
    "agg_salted_skew",          # skew
    "set_intersect",            # sets
    "window_rolling_time",      # windows
    "udf_map_in_pandas",        # udfs
    "kmeans_lloyd",             # similarity
    "multimodal_decode_wav",    # multimodal
    "asof_join_nearest",        # composed (re-earns its r2 row)
)

# Round-5 rotation worklist: after r4's window lands, 134 registered
# queries remain never-driver-checked.  Build the next window from
# them (keep the same ~8 anchors), prioritizing one per family:
#   windows (window_lag_lead, window_rolling_rows/median/corr,
#     window_cummax_cummin, window_cumprod, window_expanding,
#     window_fill_forward, window_pct_change, resample_* ...),
#   scalars (str_*, dt_*, math_*, array_*, map_struct, try_ops,
#     null_funcs, json_variant, json_normalize_nested),
#   relational (proj_*, filter_isin, na_*, replace_value, topn_head,
#     sample_hash_split, sample_weighted, combine_first),
#   joins (join_right, join_full_outer, join_theta, join_indicator,
#     join_interval_overlap, concat_axis1),
#   sets (set_union_all, set_union_schema_evolution, set_except,
#     set_intersect_all, set_except_all),
#   streaming batch-twins (stream_sliding_agg, stream_static_join,
#     stream_stream_join, stream_running_topk),
#   udf surface (udf_apply_in_pandas, udf_cogroup,
#     udf_table_function, udf_map_overlap, udf_map_in_arrow),
#   similarity/embedding (ann_lsh_probe, ann_ivf_probe,
#     dedup_embedding_cosine, embedding_* ...),
#   sources (source_orc/fwf/from_pandas/from_map/jdbc/xml/range/
#     binaryfile),
#   text (text_lang_id, text_quality_score, text_fingerprint,
#     text_repetition_metrics ...),
#   pipeline (pipeline_chunk_overlap, pipeline_decontaminate,
#     pipeline_bpe_pair_counts, topk_per_group ...),
#   multimodal (multimodal_decode_features/ppm/frame_sample/resize),
#   incremental/encoding (scd2_intervals, snapshot_diff_cdc,
#     encode_* ...), dedup composites (dedup_connected_components,
#     dedup_report, dedup_incremental_batch,
#     stat_freq_items_verified),
#   round-4 additions, all never driver-checked (graph_triangle_count,
#     graph_pagerank, graph_degree_stats, graph_link_prediction,
#     basket_association_rules, dedup_cc_star_contraction,
#     agg_winsorize, agg_rollup_grouping_id, dq_expectations,
#     window_autocorr_lag1, intervals_union_length,
#     intervals_peak_concurrency, text_tfidf_cosine_pairs,
#     text_bigram_perplexity, stat_mann_whitney, stat_bootstrap_ci,
#     stat_theil_sen_slope, stat_kll_quantile_banded,
#     stat_theta_intersection_banded, encode_robust_scale,
#     stream_cdc_upsert, sql_recursive_sessionize, multimodal_wav_rms,
#     pipeline_dataset_card).


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
