"""Differential comparison between a Spark result and a DuckDB oracle
result — modeled on the driver's check: row-count + schema (column
names) + order-insensitive values.  Columns are sorted by name and
rows by all columns before comparing; floats use a small tolerance
locally (the real driver hashes, which is why queries round floating
aggregates identically on both sides).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import numpy as np
import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (float, np.floating)) and v == 0:
        # -0.0 == 0.0 as floats, but str(-0.0) != str(0.0): the row
        # sort key would diverge between engines (DuckDB round keeps
        # the sign of zero, Spark's BigDecimal round does not) and
        # misalign the whole comparison.
        return 0.0
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.floor("us").isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (np.ndarray,)):
        return tuple(_norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _cells_equal(a, b, rtol=1e-6, atol=1e-9) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=rtol, abs_tol=atol)
        except (TypeError, ValueError):
            return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def _to_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


_KIND_GROUP = {"i": "int", "u": "int", "f": "float", "b": "bool"}


def _numeric_kind_mismatches(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> list[tuple[str, str, str]]:
    """Columns where one engine yields ints and the other floats.

    The driver hashes raw cell values, so ``41`` (Spark int64) vs
    ``41.0`` (DuckDB HUGEINT -> fetchdf float64) is a hash mismatch
    even though ``isclose`` passes — exactly the class that shipped
    the r3 ``pipeline_end_to_end`` red row.  Only the int-vs-float
    axis is enforced: object-dtype columns (strings, dates, masked
    nullables) are skipped because both engines land them
    differently for reasons the driver's hash does not see.
    """
    out = []
    for c in spark_pdf.columns:
        sg = _KIND_GROUP.get(spark_pdf[c].dtype.kind)
        og = _KIND_GROUP.get(oracle_pdf[c].dtype.kind)
        if sg is not None and og is not None and sg != og:
            out.append((c, str(spark_pdf[c].dtype), str(oracle_pdf[c].dtype)))
    return out


def assert_results_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    kind_bad = _numeric_kind_mismatches(spark_pdf, oracle_pdf)
    assert not kind_bad, (
        f"{name}: numeric dtype-kind drift (spark vs oracle) {kind_bad} — "
        "the driver hashes raw values, so int-vs-float IS a failure; "
        "CAST the oracle (DuckDB sum(BIGINT)/'//' return HUGEINT->float64) "
        "or align the Spark cast"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    s_rows, o_rows = _to_rows(spark_pdf), _to_rows(oracle_pdf)
    mismatches = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(s_rows, o_rows))
        if not all(_cells_equal(x, y) for x, y in zip(a, b))
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
