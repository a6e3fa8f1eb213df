"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `ondemand_dask_spark.registry`: every implemented
operator from SURVEY.md §2 registers a named Spark query and (when
ANSI-SQL-expressible) a DuckDB oracle; this module just exposes them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ondemand_dask_spark.registry import all_queries  # noqa: E402
from ondemand_dask_spark.session import ensure_session_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    ensure_session_conf(spark)
    q = all_queries()["tpch_q1"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → rows-only check)."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
