"""Physical-plan introspection (§4). Importing re-exports the helpers."""

from ondemand_dask_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    codegen_span_count,
    global_window_count,
    plan_string,
    pushed_filters,
    python_eval_count,
    read_schemas,
    shuffle_count,
    sort_merge_join_count,
)
