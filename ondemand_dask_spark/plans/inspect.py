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


def _top_level_brackets(s: str) -> list[str]:
    """Split a formatted-plan Arguments line into its top-level
    `[...]` groups (bracket-depth scan — function bodies inside the
    first group may nest brackets)."""
    groups: list[str] = []
    depth, start = 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]" and depth > 0:
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(s[start + 1 : i])
                start = None
    return groups


def global_window_count(df: DataFrame) -> int:
    """Unpartitioned Window operators — a no-partition window moves
    every row through ONE task, the single-task collapse this repo
    only permits on provably bounded inputs (k-row cut tables, |V|
    degree tables, per-partition count tables).  A formatted-plan
    Window node's Arguments line has three top-level groups
    `[funcs], [partitionSpec], [orderSpec]` when partitioned and two
    when not.  The two-phase rank machinery's offsets window
    (`operators/rank.py`: ORDER BY the synthetic __ods_pid — exactly
    #partitions rows by construction) is excluded: it is the
    bounded-by-construction core of the SCALE-SAFE alternative, not
    a collapse.  The synthetic column is NAMESPACED (engine prefix)
    precisely so no user column can collide with the exemption — a
    query ordering a data-sized global window by its own column
    named __ods_pid would be exempted, so the name is reserved to
    the rank operators by convention (review finding, r8).

    Discriminating the two-group case: a formatted Arguments line has
    `[funcs], [partitionSpec], [orderSpec]` when both are present,
    but an UNORDERED partitioned window (`partitionBy` only — scales
    fine, it is just groupBy+broadcast-back) also prints two groups.
    Order specs always carry ASC/DESC markers; partition specs are
    bare columns — that marker is the tell."""
    plan = plan_string(df)
    n = 0
    for m in re.finditer(
        r"\(\d+\) Window\b[^\n]*\nInput[^\n]*\nArguments: ([^\n]*)", plan
    ):
        groups = _top_level_brackets(m.group(1))
        if len(groups) <= 1:
            n += 1  # neither partition nor order: one global frame
        elif (
            len(groups) == 2
            and (" ASC" in groups[1] or " DESC" in groups[1])
            # exclusion matches EXACTLY the order spec the rank
            # machinery emits (Window.orderBy("__ods_pid") over the
            # #partitions-row counts table) — a substring test would
            # also silently exempt a data-sized global window ordered
            # by a user column that merely ends in the same suffix
            and not re.fullmatch(
                r"__ods_pid#\d+L? ASC NULLS FIRST", groups[1].strip()
            )
        ):
            n += 1  # ordered, unpartitioned (and not the rank offsets)
    return n


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
