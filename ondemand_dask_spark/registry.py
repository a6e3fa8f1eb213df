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


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (imports trigger registration)."""
    global _LOADED
    if _LOADED:
        return
    import ondemand_dask_spark.queries  # noqa: F401  (side-effect imports)

    _LOADED = True
