"""Physical-plan introspection — the 100 TB posture, enforced.

SURVEY §4 establishes that Catalyst already implements every rewrite
the reference stack performs; what remains OUR responsibility is that
queries are *expressed* so those rewrites fire.  These helpers parse
`explain('formatted')` output so tests can assert plan properties —
"filters reached the scan", "dimensions broadcast", "exactly one
shuffle", "no Python in this path" — instead of hoping.  A plan
regression (a new shuffle, a lost pushdown) then fails CI like any
correctness bug, which is the only way plan quality survives
refactors.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def shuffle_count(df: DataFrame) -> int:
    """Data shuffles (Exchange nodes, broadcast excluded).  Every one
    of these is a full network redistribution at scale."""
    plan = plan_string(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def broadcast_join_count(df: DataFrame) -> int:
    plan = plan_string(df)
    return len(re.findall(r"\(\d+\) BroadcastHashJoin\b", plan)) + len(
        re.findall(r"\(\d+\) BroadcastNestedLoopJoin\b", plan)
    )


def sort_merge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"\(\d+\) SortMergeJoin\b", plan_string(df)))


def python_eval_count(df: DataFrame) -> int:
    """Python-boundary operators (ArrowEvalPython / BatchEvalPython /
    MapInPandas / FlatMapGroupsInPandas...) — must be zero in benched
    relational paths."""
    plan = plan_string(df)
    return len(
        re.findall(
            r"\(\d+\) (ArrowEvalPython|BatchEvalPython|MapInPandas|"
            r"FlatMapGroupsInPandas|PythonMapInArrow|MapInArrow)\b",
            plan,
        )
    )


def codegen_span_count(df: DataFrame) -> int:
    """WholeStageCodegen spans — fused JVM loops.  More fusion =
    fewer materialization points.  (Simple mode prints span ids as
    `*(n)`; formatted mode only stars the nodes.)"""
    return len(set(re.findall(r"\*\((\d+)\)", plan_string(df, mode="simple"))))


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry across the plan's scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan_string(df)):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — the column-pruning proof."""
    return re.findall(r"ReadSchema: struct<(.*?)>", plan_string(df))
