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
    # --- round-5 rotation: the driver checks only this 50-entry
    # prefix per round.  r4 went 50/50 (cumulative driver-green:
    # 129 of 306 + 1 rows-only); this window keeps the same 8
    # anchors and fills 42 slots from the 176 never-checked,
    # prioritizing the round-4 additions (graph, stats, intervals,
    # DataSketches, incremental, CDC) that have zero external
    # evidence — exactly the pre-committed r5 worklist.
    #
    # anchors (driver-green every round they appeared)
    "tpch_q1", "tpch_q3",
    "join_inner", "agg_groupby_basic", "agg_groupby_quantile",
    "window_cumsum", "dedup_minhash_lsh", "pipeline_end_to_end",
    # graph family — all never checked, incl. the fixpoint-loop
    # k-core landing this round
    "graph_triangle_count", "graph_pagerank", "graph_kcore",
    "graph_degree_stats", "graph_link_prediction",
    "basket_association_rules",
    # iterative dedup composites (label propagation + O(log n) twin)
    "dedup_connected_components", "dedup_cc_star_contraction",
    # statistics / sketches
    "stat_mann_whitney", "stat_bootstrap_ci", "stat_theil_sen_slope",
    "stat_kll_quantile_banded", "stat_theta_intersection_banded",
    # aggregation + data-quality additions
    "agg_winsorize", "agg_rollup_grouping_id", "dq_expectations",
    # interval algebra
    "intervals_union_length", "intervals_peak_concurrency",
    # CDC / recursive SQL (both touched by this round's fixes)
    "stream_cdc_upsert", "sql_recursive_sessionize",
    # Python-boundary families (directive: widen §2.J/multimodal
    # driver evidence beyond udf_map_in_pandas + decode_wav)
    "multimodal_wav_rms", "multimodal_decode_features",
    "udf_cogroup", "udf_map_overlap", "udf_table_function",
    # text additions
    "text_tfidf_cosine_pairs", "text_bigram_perplexity",
    # time-series windows + relational + scalars representatives
    "window_autocorr_lag1", "flag_duplicated", "str_predicates",
    # encodings / ML eval
    "encode_robust_scale", "ml_eval_binary",
    # incremental snapshot algebra + sources + similarity + skew reps
    "scd2_intervals", "source_orc_roundtrip", "ann_lsh_probe",
    "join_salted_skew",
    # pipeline
    "pipeline_dataset_card", "pipeline_bpe_pair_counts",
    # streaming batch-twins
    "stream_stream_join",
    # joins / sets / windows representatives
    "join_full_outer", "set_union_schema_evolution", "window_lag_lead",
)

# Round-6 rotation worklist: after r5's window lands, 134 registered
# queries remain never-driver-checked (barring additions this round —
# regenerate the list from CORRECTNESS_r0{1..5}.json ∪ registry).
# Build the next window from them (keep the same ~8 anchors),
# prioritizing one per family:
#   windows (window_rolling_rows/median/corr, window_cummax_cummin,
#     window_cumprod, window_expanding, window_distinct_expanding,
#     window_fill_forward, window_pct_change, window_nth_first_last,
#     window_cusum_drift, window_interpolate_linear,
#     window_time_weighted_avg, window_zscore_rolling,
#     window_transform_broadcast, resample_hour_window,
#     resample_asfreq_gapfill, resample_ohlc),
#   scalars (str_predicates/replace_extract/edit_distance/pad_concat/
#     split_explode/count_occurrences/char_classes/format/slice_parse,
#     dt_parts/arith/calendar/boundaries, math_transcendental/hash/
#     binning/bitwise, array_explode_outer/sort_distinct/hof/set_ops/
#     mutation, map_struct, try_ops, null_funcs, json_variant,
#     json_normalize_nested),
#   relational (proj_assign, proj_drop_rename_cast, filter_isin,
#     cond_where_mask, na_drop, na_fill, replace_value, topn_head,
#     slice_loc_between, sample_seeded/hash_split/weighted,
#     combine_first, flag_duplicated),
#   joins (join_right, join_cross, join_theta, join_indicator,
#     join_interval_overlap, concat_axis1),
#   sets (set_union_all, set_except, set_intersect_all,
#     set_except_all),
#   streaming batch-twins (stream_static_join, stream_running_topk,
#     stream_foreachbatch_sink, stream_stateful_counter),
#   udf surface (udf_apply_in_pandas, udf_ewm, udf_map_in_arrow),
#   similarity/embedding (ann_lsh_probe, ann_lsh_bucket_stats,
#     ann_ivf_probe, dedup_embedding_cosine, embedding_* ...),
#   sources (source_orc/fwf/from_pandas/from_map/jdbc/xml/range/
#     binaryfile, jdbc_source_plan),
#   text (text_lang_id, text_quality_score, text_fingerprint,
#     text_unigram_surprisal, text_zipf_fit, text_oov_rate,
#     text_repetition_metrics),
#   pipeline (pipeline_chunk_overlap/stratified_sample/heavy_hitters/
#     pii_redact/shard_shuffle/length_histogram/negative_pairs/
#     interleave_sources/curriculum_order/filter_cascade/
#     span_corruption, topk_per_group, topk_nsmallest),
#   multimodal (multimodal_binary_meta/decode_ppm/frame_sample/
#     resize),
#   stats (stat_corr_matrix, stat_welch_ttest, stat_chi2_independence,
#     stat_ks_two_sample, stat_freq_items_verified, agg_mode,
#     agg_weighted_median, dq_profile_report),
#   encodings (encode_label/standardize/minmax/multi_hot/target_mean),
#   dedup composites (dedup_report, dedup_incremental_batch,
#     dedup_minhash_ml), events (events_burst_days),
#   round-5 additions, all never driver-checked (dedup_duplicate_spans,
#     join_set_similarity, dedup_semantic_embedding, text_bm25_topk,
#     graph_modularity, source_parquet_merge_schema, dq_psi_drift,
#     stat_anova_oneway, stat_spearman_corr, window_max_drawdown,
#     events_markov_transitions, dq_referential_integrity,
#     pipeline_purge_audit, events_attribution_last_touch,
#     source_python_datasource, sort_global_rank_scalable,
#     incremental_partial_agg_merge, source_csv_corrupt_permissive,
#     embedding_matryoshka_recall, dedup_ngram_containment,
#     sample_n_per_group, scd2_pit_lookup, dedup_priority_keep,
#     events_rfm_segmentation, pipeline_length_bucket_batching,
#     events_bot_regularity, orders_pareto_concentration,
#     agg_hhi_concentration, window_gap_detection).


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
