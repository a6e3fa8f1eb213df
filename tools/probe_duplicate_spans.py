"""Scale probe: span-level dedup (dedup_duplicate_spans' shape) at
100k+ synthetic documents with planted boilerplate.

Documents are deterministic md5-token streams (no RNG); every 10th
document splices in a 16-token run from a shared boilerplate pool at
a position derived from its id — the verbatim-license/template shape
span dedup exists to catch.  Reports gram volume, cross-doc duplicate
grams, docs flagged, mean dup fraction among flagged docs, and wall
time for the full pipeline (gram build -> hash shuffle -> min!=max
cut -> islands merge).

Usage: python tools/probe_duplicate_spans.py [n_docs] [doc_len]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from ondemand_dask_spark.functions.texthash import (  # noqa: E402
    portable_hash64,
)
from ondemand_dask_spark.session import build_session  # noqa: E402

K = 8  # gram width (same as the registered query)
SPAN = 16  # planted boilerplate run length


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spark = build_session(app_name="probe_dup_spans")
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(n).select(F.col("id").alias("doc_id"))

    def tok(j):
        # vocabulary of ~50k tokens — md5-derived, deterministic
        return F.concat(
            F.lit("t"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("_", F.col("doc_id"), F.lit(j))),
                        1, 8,
                    ), 16, 10,
                ).cast("long") % 50_000
            ).cast("string"),
        )

    def boiler(j):
        # shared pool of 20 boilerplate sequences; doc picks one by id
        return F.concat(
            F.lit("b"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit("_"),
            F.lit(j).cast("string"),
        )

    planted = F.col("doc_id") % 10 == 0
    start = (F.col("doc_id") % (doc_len - SPAN)).cast("int")
    cols = []
    for j in range(doc_len):
        in_span = planted & (F.lit(j) >= start) & (F.lit(j) < start + SPAN)
        cols.append(F.when(in_span, boiler(j)).otherwise(tok(j)))
    docs = ids.select("doc_id", F.concat_ws(" ", *cols).alias("text"))

    t0 = time.perf_counter()
    from ondemand_dask_spark.functions.texthash import shingles

    base = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens"), "text"
    )
    grams = base.select(
        "doc_id", F.posexplode(shingles(F.col("text"), K)).alias("pos0", "g")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("s"),
        (F.col("pos0") + K).alias("e"),
        portable_hash64(F.col("g")).alias("gh"),
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("gh")
    )
    hits = grams.join(dup, "gh").select("doc_id", "s", "e")
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = hits.select(
        "doc_id", "s", "e",
        F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-(2**63))), 1)
        .otherwise(0).alias("ni"),
    )
    islands = flagged.select(
        "doc_id", "s", "e",
        F.sum("ni").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("iid"),
    )
    cov = (
        islands.groupBy("doc_id", "iid")
        .agg((F.max("e") - F.min("s") + 1).alias("len"))
        .groupBy("doc_id")
        .agg(F.sum("len").alias("dup_tokens"))
    )
    stats = (
        base.join(cov, "doc_id", "left")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("dup_tokens") > 0).cast("int")).alias("n_flagged"),
            F.avg(
                F.when(
                    F.col("dup_tokens") > 0,
                    F.col("dup_tokens") / F.col("n_tokens"),
                )
            ).alias("mean_dup_frac_flagged"),
        )
        .first()
    )
    dt = time.perf_counter() - t0
    n_grams = n * (doc_len - K + 1)
    print(json.dumps({
        "n_docs": stats["n_docs"],
        "n_grams": n_grams,
        "n_flagged": int(stats["n_flagged"] or 0),
        "expected_flagged_floor": n // 10,
        "mean_dup_frac_flagged": round(
            float(stats["mean_dup_frac_flagged"] or 0), 4
        ),
        "wall_sec": round(dt, 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
