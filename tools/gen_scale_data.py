"""Deterministic sf-N testdata generator for scale drives.

The driver's own generator (TESTDATA.md) is not part of this repo and
tops out at the committed sf0.1.  This tool synthesizes the same ten
tables at any multiple so the headline bench + plan census can be
driven at sf1+ (the r9 verdict's "convert the 100x posture from
plan-audit to measurement" ask).  Shapes are matched to the profiled
sf0.1 data (row ratios, key cardinalities, categorical vocabularies,
value ranges, planted near/exact document duplicates, 10-cluster
unit-norm embeddings); they are NOT byte-identical to the driver's
data — this is a PERF instrument, correctness still gates on the
driver's own parquet at sf0.01.

Every column derives from xxhash64(table-salt, id) — pure JVM
codegen, generated distributed via spark.range, no driver-side
materialization, no RNG state (seed folded into the salts).

Usage: python tools/gen_scale_data.py [--sf 1] [--out /tmp/spark_graft_testdata]
Writes {out}/sf{sf}/{table}.parquet; skips tables already on disk.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ondemand_dask_spark.session import build_session  # noqa: E402

# Base row counts at sf=1 (10x the profiled sf0.1 driver data).
BASE = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_PWORDS = [
    "anvil", "blue", "bolt", "cold", "gear", "gizmo", "hot", "large",
    "new", "old", "plate", "red", "ring", "rod", "small", "widget",
]
_DOCWORDS = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
_LANGS = ["en", "de", "es", "fr", "zh"]  # en-heavy skew like the fixture


def _h(salt: str, *cols):
    """Deterministic 64-bit stream: xxhash64 of (salt, cols...)."""
    return F.xxhash64(F.lit(salt), *cols)


def _u(salt: str, *cols):
    """Uniform in (0, 1] — never exactly 0 so ln(u) is safe."""
    return (F.pmod(_h(salt, *cols), F.lit(1_000_000)) + 1) / 1_000_000.0


def _pick(salt: str, values: list[str], *cols):
    return F.array(*[F.lit(v) for v in values])[
        F.pmod(_h(salt, *cols), F.lit(len(values))).cast("int")
    ]


def _gauss(salt: str, *cols):
    """Box-Muller from two hash-derived uniforms."""
    u1 = _u(salt + "/u1", *cols)
    u2 = _u(salt + "/u2", *cols)
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * 3.141592653589793 * u2)


def _region(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(_REGIONS)],
        "r_regionkey: long, r_name: string",
    )


def _nation(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey: long, n_name: string, n_regionkey: long",
    )


def _customer(spark, n):
    return spark.range(n, numPartitions=8).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        F.pmod(_h("cnat", "id"), F.lit(25)).cast("int").alias("c_nationkey"),
        F.round(-1000.0 + _u("cbal", "id") * 11000.0, 2).alias("c_acctbal"),
        _pick("cseg", _SEGMENTS, F.col("id")).alias("c_mktsegment"),
    )


def _supplier(spark, n):
    return spark.range(n, numPartitions=4).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        F.pmod(_h("snat", "id"), F.lit(25)).cast("int").alias("s_nationkey"),
        F.round(-1000.0 + _u("sbal", "id") * 11000.0, 2).alias("s_acctbal"),
    )


def _part(spark, n):
    w = lambda salt: _pick(salt, _PWORDS, F.col("id"))  # noqa: E731
    return spark.range(n, numPartitions=8).select(
        F.col("id").alias("p_partkey"),
        F.concat(w("pw1"), F.lit(" "), w("pw2")).alias("p_name"),
        F.format_string(
            "Brand#%d", 1 + F.pmod(_h("pbr", "id"), F.lit(25)).cast("int")
        ).alias("p_brand"),
        _pick("pty", _PTYPES, F.col("id")).alias("p_type"),
        (1 + F.pmod(_h("psz", "id"), F.lit(50))).cast("int").alias("p_size"),
        F.round(900.0 + _u("ppr", "id") * 99.9, 2).alias("p_retailprice"),
    )


def _orders(spark, n, n_cust):
    st = F.pmod(_h("ost", "id"), F.lit(100))
    return spark.range(n, numPartitions=16).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(_h("ocust", "id"), F.lit(n_cust)).alias("o_custkey"),
        F.when(st < 49, "F").when(st < 98, "O").otherwise("P").alias(
            "o_orderstatus"
        ),
        F.round(1000.0 + _u("opr", "id") * 499000.0, 2).alias("o_totalprice"),
        F.timestamp_seconds(
            F.lit(788918400)  # 1995-01-01 UTC
            + F.pmod(_h("odt", "id"), F.lit(2404)) * 86400
        ).cast("timestamp_ntz").alias("o_orderdate"),
        _pick(
            "opri",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            F.col("id"),
        ).alias("o_orderpriority"),
    )


def _lineitem(spark, n_orders, n_part, n_supp):
    # 1 + pmod(h, 7) lines per order: avg 4 (the profiled fixture's
    # 4.08), generated by exploding a per-order sequence so
    # l_linenumber is dense 1..k — one narrow pass, no join.
    o = spark.range(n_orders, numPartitions=32).select(
        F.col("id").alias("l_orderkey"),
        F.explode(
            F.sequence(
                F.lit(1), (1 + F.pmod(_h("nl", "id"), F.lit(7))).cast("int")
            )
        ).alias("l_linenumber"),
    )
    k = F.col("l_orderkey")
    ln = F.col("l_linenumber")
    qty = (1 + F.pmod(_h("lq", k, ln), F.lit(50))).cast("double")
    return o.select(
        "l_orderkey",
        F.pmod(_h("lp", k, ln), F.lit(n_part)).alias("l_partkey"),
        F.pmod(_h("ls", k, ln), F.lit(n_supp)).alias("l_suppkey"),
        "l_linenumber",
        qty.alias("l_quantity"),
        F.round(qty * (1500.0 + _u("lep", k, ln) * 1153.0), 2).alias(
            "l_extendedprice"
        ),
        (F.pmod(_h("ld", k, ln), F.lit(11)) / 100.0).alias("l_discount"),
        (F.pmod(_h("lt", k, ln), F.lit(9)) / 100.0).alias("l_tax"),
        _pick("lrf", ["A", "N", "R"], k, ln).alias("l_returnflag"),
        _pick("lls", ["O", "F"], k, ln).alias("l_linestatus"),
        F.timestamp_seconds(
            F.lit(788918400)
            + F.pmod(_h("odt", k), F.lit(2404)) * 86400  # the order date
            + (1 + F.pmod(_h("lsd", k, ln), F.lit(95))) * 86400
        ).cast("timestamp_ntz").alias("l_shipdate"),
    )


def _events(spark, n, n_users):
    return spark.range(n, numPartitions=16).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200)  # 2024-01-01 UTC
            + F.pmod(_h("ets", "id"), F.lit(30 * 86400))
            + _u("etf", "id")
        ).cast("timestamp_ntz").alias("ts"),
        F.pmod(_h("eus", "id"), F.lit(n_users)).alias("user_id"),
        _pick(
            "ety", ["view", "click", "purchase", "signup", "error"],
            F.col("id"),
        ).alias("event_type"),
        F.round(-50.0 * F.log(_u("eva", "id")), 2).alias("value"),
        F.format_string(
            '{"k": %d}', F.pmod(_h("epk", "id"), F.lit(100)).cast("int")
        ).alias("props"),
    )


def _documents(spark, n):
    # Planted duplicate structure: id % 100 == 99 -> EXACT dup of
    # id-1 (all tokens keyed on the content seed); id % 20 == 19 (and
    # not an exact dup) -> NEAR dup of id-1 (last 3 of ~40-100 tokens
    # re-keyed on the doc's own id).  ~1% exact + ~4% near keeps the
    # LSH/banding candidate sets realistically non-empty at any sf.
    seed = (
        F.when(F.pmod(F.col("id"), F.lit(20)) == 19, F.col("id") - 1)
        .otherwise(F.col("id"))
    )
    d = spark.range(n, numPartitions=8).select(
        F.col("id").alias("doc_id"),
        seed.alias("seed"),
        (F.pmod(F.col("id"), F.lit(100)) == 99).alias("exact"),
        (40 + F.pmod(_h("ntok", seed), F.lit(61))).cast("int").alias("ntok"),
    )
    tail_owner = F.when(F.col("exact"), F.col("seed")).otherwise(
        F.col("doc_id")
    )
    body = F.transform(
        F.sequence(F.lit(1), F.col("ntok") - 3),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in _DOCWORDS]),
            (F.pmod(_h("tok", F.col("seed"), i), F.lit(len(_DOCWORDS)))
             + 1).cast("int"),
        ),
    )
    tail = F.transform(
        F.sequence(F.col("ntok") - 2, F.col("ntok")),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in _DOCWORDS]),
            (F.pmod(_h("tok", tail_owner, i), F.lit(len(_DOCWORDS)))
             + 1).cast("int"),
        ),
    )
    lang_u = F.pmod(_h("lang", F.col("seed")), F.lit(100))
    text = F.array_join(F.concat(body, tail), " ")
    return d.select(
        "doc_id",
        text.alias("text"),
        F.when(lang_u < 40, "en")
        .when(lang_u < 55, "de")
        .when(lang_u < 70, "es")
        .when(lang_u < 85, "fr")
        .otherwise("zh")
        .alias("lang"),
        F.format_string(
            "src%d", F.pmod(_h("src", F.col("seed")), F.lit(20)).cast("int")
        ).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def _embeddings(spark, n):
    # 10 Gaussian clusters: centroid components keyed on the label,
    # noise (sigma 0.35) keyed on the vec_id; unit-normalized, stored
    # float32 like the driver fixture.
    e = spark.range(n, numPartitions=8).select(
        F.col("id").alias("vec_id"),
        F.pmod(_h("elab", "id"), F.lit(10)).cast("int").alias("label"),
    )
    dims = F.sequence(F.lit(0), F.lit(63))
    raw = F.transform(
        dims,
        lambda d: (
            F.sqrt(-2.0 * F.log(
                (F.pmod(F.xxhash64(F.lit("c/u1"), F.col("label"), d),
                        F.lit(1_000_000)) + 1) / 1_000_000.0
            ))
            * F.cos(2.0 * 3.141592653589793
                    * (F.pmod(F.xxhash64(F.lit("c/u2"), F.col("label"), d),
                              F.lit(1_000_000)) + 1) / 1_000_000.0)
            + 0.35 * (
                F.sqrt(-2.0 * F.log(
                    (F.pmod(F.xxhash64(F.lit("n/u1"), F.col("vec_id"), d),
                            F.lit(1_000_000)) + 1) / 1_000_000.0
                ))
                * F.cos(2.0 * 3.141592653589793
                        * (F.pmod(F.xxhash64(F.lit("n/u2"), F.col("vec_id"),
                                             d),
                                  F.lit(1_000_000)) + 1) / 1_000_000.0)
            )
        ),
    )
    withraw = e.withColumn("raw", raw)
    nrm = F.sqrt(
        F.aggregate(
            F.col("raw"), F.lit(0.0), lambda a, x: a + x * x
        )
    )
    return withraw.select(
        "vec_id",
        F.transform(F.col("raw"), lambda x: (x / nrm).cast("float")).alias(
            "embedding"
        ),
        "label",
    )


def generate(spark: SparkSession, sf: float, out_dir: str) -> None:
    counts = {t: max(1, int(b * sf)) for t, b in BASE.items()}
    n_users = max(1, counts["events"] // 67)  # fixture's ~67 events/user
    builders = {
        "region": lambda: _region(spark),
        "nation": lambda: _nation(spark),
        "customer": lambda: _customer(spark, counts["customer"]),
        "supplier": lambda: _supplier(spark, counts["supplier"]),
        "part": lambda: _part(spark, counts["part"]),
        "orders": lambda: _orders(spark, counts["orders"],
                                  counts["customer"]),
        "lineitem": lambda: _lineitem(spark, counts["orders"],
                                      counts["part"], counts["supplier"]),
        "events": lambda: _events(spark, counts["events"], n_users),
        "documents": lambda: _documents(spark, counts["documents"]),
        "embeddings": lambda: _embeddings(spark, counts["embeddings"]),
    }
    os.makedirs(out_dir, exist_ok=True)
    for name, build in builders.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            print(f"  {name}: exists, skipping", file=sys.stderr)
            continue
        t0 = time.time()
        build().write.mode("overwrite").parquet(path)
        print(f"  {name}: wrote in {time.time() - t0:.1f}s",
              file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/spark_graft_testdata")
    args = ap.parse_args()
    sf_name = f"sf{args.sf:g}"
    out = os.path.join(args.out, sf_name)
    spark = build_session(app_name="gen_scale_data")
    generate(spark, args.sf, out)
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
