"""`io.load_table` must normalize BOTH events.ts parquet encodings the
driver's testdata generator has shipped — INT64 TIMESTAMP(NANOS)
(readable only via the nanosAsLong legacy flag, as bigint ns) and
plain TIMESTAMP(MICROS) naive — to the same µs timestamp_ntz values.
The generator changed encodings between rounds once already; this
pins that either generation keeps working.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ondemand_dask_spark.io import load_table

_TS_US = [
    1_704_067_200_000_000,  # 2024-01-01T00:00:00
    1_704_067_200_123_456,  # …+123456 µs
    1_706_572_800_999_999,  # 2024-01-30T00:00:00.999999
]


def _write(tmpdir: str, unit: str) -> str:
    sf_dir = os.path.join(tmpdir, unit)
    os.makedirs(sf_dir, exist_ok=True)
    factor = 1_000 if unit == "ns" else 1
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [t * factor for t in _TS_US], pa.timestamp(unit)
            ),
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_normalizes_both_ts_encodings(spark, tmp_path, unit):
    sf_dir = _write(str(tmp_path), unit)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    exp = [
        datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=t)
        for t in _TS_US
    ]
    assert got == exp
