"""Scale probe: two-stage retrieval with the sign-bit Hamming sketch.

Synthesizes N CLUSTERED unit-ish vectors (deterministic integer
arithmetic — no RNG: vector i belongs to cluster i % C, with a
per-dimension deterministic jitter), then measures, for Q query
vectors:

  1. EXACT  — brute-force cosine top-k against the float vectors
     (the `ann_cosine_topk` shape): the truth set and the cost
     ceiling;
  2. SKETCH — Hamming top-S shortlist on the packed sign bits (two
     BIGINT words per vector, XOR + popcount — the
     `embedding_signbit_hamming` shape), then an exact cosine
     re-rank of only the S survivors.

Reported: wall time of each stage and recall@k of the two-stage
result against the exact truth.  The scale point: the shortlist scan
touches 16 B/vector instead of D*4 B and stays in codegen integer
ops.  Measured (local[32], warm, 2026-08-14):

  400k vectors, shortlist 500:  exact 5.48 s -> two-stage 2.46 s
      (+0.73 s one-time sketch build), recall@5 = 0.60
  100k vectors, shortlist 500:  exact 2.55 s -> two-stage 1.40 s,
      recall@5 = 0.64
  shortlist 2000 at 400k: recall only 0.64 but the per-query top-2000
      window costs more than exact — past the sweet spot.

The ~0.6 recall ceiling is the honest resolution limit of 1 bit/dim
at D=64: the sketch is a SHORTLIST/coarse-dedup stage; for high-
recall ANN use more bits per dimension (embedding_quantize_int8) or
the IVF route (ann_ivf_probe).  Numbers cited in the
embedding_signbit_hamming docstring's scale contract.

Usage: python tools/probe_signbit.py [n_vectors] [dim] [clusters] [shortlist]
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

from ondemand_dask_spark.session import build_session  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 64
C = int(sys.argv[3]) if len(sys.argv) > 3 else 50
Q = 10          # query vectors
K = 5           # final neighbors
SHORTLIST = int(sys.argv[4]) if len(sys.argv) > 4 else 500  # survivors/query


def main() -> None:
    spark = build_session(
        app_name="probe_signbit",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # vector i: dim d value = centroid(cluster, d) + jitter(i, d),
    # all exact integer arithmetic scaled down — deterministic and
    # clustered (cosine structure a sketch can exploit).
    base = spark.range(N).select(
        F.col("id").alias("vec_id"), (F.col("id") % C).alias("cl")
    )
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(D)),
        lambda d: (
            ((F.col("cl") * 73856093 + d * 19349663) % 2001 - 1000)
            + ((F.col("vec_id") * 83492791 + d * 2654435761) % 1201 - 600)
        ).cast("double"),
    )
    vecs = base.select("vec_id", emb.alias("embedding")).cache()
    vecs.count()

    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda a: F.sqrt(dot(a, a))  # noqa: E731

    q = vecs.filter(F.col("vec_id") < Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )

    # -- stage 0: exact brute force (truth + cost ceiling)
    t0 = time.perf_counter()
    exact = (
        vecs.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot(F.col("q_emb"), F.col("embedding"))
                / (nrm(F.col("q_emb")) * nrm(F.col("embedding")))
            ).alias("cos"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cos"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rnk") <= K)
        .collect()
    )
    t_exact = time.perf_counter() - t0
    truth = {(r.query_id, r.neighbor_id) for r in exact}

    # -- stage 1: sign-bit sketch shortlist (packed words, XOR+popcount)
    def word(lo: int):
        return F.expr(
            f"aggregate(sequence({lo}, {min(lo + 31, D)}), 0L, (acc, i) ->"
            f" acc + IF(embedding[i-1] > 0, shiftleft(1L, i - {lo}), 0L))"
        )

    t0 = time.perf_counter()
    sk = vecs.select(
        "vec_id", word(1).alias("w0"), word(33).alias("w1")
    ).cache()
    sk.count()
    t_sketch_build = time.perf_counter() - t0

    qs = sk.filter(F.col("vec_id") < Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    t0 = time.perf_counter()
    short = (
        sk.join(F.broadcast(qs), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.bit_count(F.col("q0").bitwiseXOR(F.col("w0")))
                + F.bit_count(F.col("q1").bitwiseXOR(F.col("w1")))
            ).alias("hamming"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc("hamming"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rnk") <= SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    # -- stage 2: exact re-rank of the shortlist only
    rer = (
        short.join(
            vecs.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("n_emb"),
            ),
            "neighbor_id",
        )
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("q_emb"), F.col("n_emb"))
                / (nrm(F.col("q_emb")) * nrm(F.col("n_emb")))
            ).alias("cos"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cos"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rnk") <= K)
        .collect()
    )
    t_two_stage = time.perf_counter() - t0
    got = {(r.query_id, r.neighbor_id) for r in rer}
    recall = len(truth & got) / len(truth)

    print(
        json.dumps(
            {
                "n_vectors": N,
                "dim": D,
                "clusters": C,
                "shortlist": SHORTLIST,
                "t_exact_bruteforce_sec": round(t_exact, 2),
                "t_sketch_build_sec": round(t_sketch_build, 2),
                "t_shortlist_plus_rerank_sec": round(t_two_stage, 2),
                "recall_at_k": round(recall, 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
