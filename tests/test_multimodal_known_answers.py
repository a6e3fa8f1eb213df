"""Three-way agreement pin for the PPM decode + aHash pipeline.

The registered query decodes with numpy over raw bytes; its oracle
recomputes gray means from the fixture's pixel-GENERATION formula.
Both could share a misunderstanding of the format (header scan,
channel order, bit packing).  This test decodes the same PPM bytes a
THIRD way — a dependency-free pure-Python byte walk implementing the
aHash definition from first principles — and requires the query to
agree, on a mini documents fixture that routes one doc through the
image path (doc_id % 10 == 0).
"""

from __future__ import annotations

import os

import pandas as pd

from ondemand_dask_spark.queries.multimodal import _ppm_bytes
from ondemand_dask_spark.registry import all_queries


def _ahash_literal(b: bytes) -> tuple[int, float, int]:
    """(n_pixels, mean_gray, ahash) by a plain byte walk."""
    assert b[:2] == b"P6"
    header, rest = b.split(b"\n", 1)
    dims, rest = rest.split(b"\n", 1)
    _maxval, pixels = rest.split(b"\n", 1)
    w, h = (int(x) for x in dims.split())
    grays = [
        (pixels[3 * i] + pixels[3 * i + 1] + pixels[3 * i + 2]) / 3.0
        for i in range(w * h)
    ]
    mean = sum(grays) / len(grays)
    sig = 0
    for i, g in enumerate(grays[:64]):
        if g > mean:
            sig |= 1 << i
    return w * h, mean, sig


def test_ahash_matches_literal_byte_walk(spark, tmp_path):
    sf_dir = os.path.join(str(tmp_path), "mini")
    os.makedirs(sf_dir, exist_ok=True)
    doc_ids = [0, 10, 20, 30]  # % 10 == 0 → the PPM image path
    pd.DataFrame(
        {"doc_id": doc_ids, "text": ["x"] * len(doc_ids)}
    ).to_parquet(os.path.join(sf_dir, "documents.parquet"))

    got = {
        int(r["doc_id"]): (
            int(r["n_pixels"]),
            float(r["mean_gray"]),
            int(r["ahash"]),
        )
        for r in all_queries()["multimodal_image_ahash"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(doc_ids)
    for d in doc_ids:
        n_px, mean, sig = _ahash_literal(_ppm_bytes(d))
        assert got[d][0] == n_px, d
        assert abs(got[d][1] - round(mean - 1e-9, 4)) < 1e-6, d
        assert got[d][2] == sig, (d, hex(got[d][2]), hex(sig))
