"""Scale probe: prefix-filter candidate volume vs the n² it avoids.

Synthesizes N token sets (deterministic md5-derived tokens — no RNG,
Zipf-ish frequency skew so common tokens exist like real vocabularies)
and runs the join_set_similarity pipeline shape over them, reporting:

  - total possible pairs (n²/2, what a naive similarity join scans)
  - candidate pairs emitted by the prefix-filter equi-join
  - verified pairs (the actual answer)
  - wall time

The point: candidates must track collisions on the RAREST tokens of
each set, orders of magnitude under n²/2 — the property that makes the
operator viable at 100 TB.

Usage: python tools/probe_prefix_filter.py [n_sets] [vocab] [set_size]
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

from ondemand_dask_spark.session import build_session  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = build_session(app_name="probe_prefix_filter")
    spark.sparkContext.setLogLevel("ERROR")

    # Deterministic synthetic sets: token j of set i is md5-derived,
    # squared to skew toward low ids (Zipf-ish head).
    ids = spark.range(n).select(F.col("id").alias("set_id"))
    sets = ids.select(
        "set_id",
        F.array_distinct(
            F.array(
                *[
                    F.concat(F.lit("w"), tok_id_expr(j, vocab).cast("string"))
                    for j in range(size)
                ]
            )
        ).alias("toks"),
    )

    t0 = time.perf_counter()
    df_tok = sets.select("set_id", F.explode("toks").alias("tok"))
    vocab_df = df_tok.groupBy("tok").agg(F.count("*").alias("df"))
    ordered = (
        df_tok.join(F.broadcast(vocab_df), "tok")
        .groupBy("set_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("st"))
        .select("set_id", F.transform("st", lambda s: s["tok"]).alias("toks"))
    )
    t = 0.6
    nn = F.size("toks")
    min_overlap = F.ceil(F.lit(t) * nn - F.lit(1e-9))
    pref = ordered.select(
        "set_id",
        F.explode(F.slice("toks", 1, (nn - min_overlap + 1).cast("int"))
                  ).alias("ptok"),
    )
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.ptok") == F.col("b.ptok"))
            & (F.col("a.set_id") < F.col("b.set_id")),
        )
        .select(F.col("a.set_id").alias("pa"), F.col("b.set_id").alias("pb"))
        .distinct()
        .cache()
    )
    n_cand = cand.count()
    sa = ordered.select(F.col("set_id").alias("pa"), F.col("toks").alias("ta"))
    sb = ordered.select(F.col("set_id").alias("pb"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    jac = inter.cast("double") / (F.size("ta") + F.size("tb") - inter)
    n_match = cand.join(sa, "pa").join(sb, "pb").filter(jac >= t).count()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "n_sets": n,
        "possible_pairs": n * (n - 1) // 2,
        "candidate_pairs": n_cand,
        "verified_pairs": n_match,
        "candidate_fraction": round(n_cand / (n * (n - 1) / 2), 8),
        "wall_sec": round(dt, 2),
    }))
    spark.stop()
    return 0


def tok_id_expr(j, vocab):
    """md5-derived token id for position j (deterministic, skewed)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("_", F.col("set_id"), F.lit(j))), 1, 8),
        16, 10,
    ).cast("double") / F.lit(float(16**8))
    return (F.pow(h, 2.0) * vocab).cast("int")


if __name__ == "__main__":
    raise SystemExit(main())
