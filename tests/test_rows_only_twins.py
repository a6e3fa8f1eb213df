"""Value-level checks for the 3 declared rows-only queries (plus the
statistical pin for sample_seeded, which gained a full seeded-hash
oracle in r9 but should still BEHAVE like the Bernoulli it models).

Each rows-only query (no DuckDB oracle by design) has an
oracle-checked twin; "ran, rows >= 0" is not evidence of correct
VALUES, so these tests bind each one to its twin:

- `udf_ewm` (exact pandas recursion) vs `window_ewm_bounded`
  (L=32-truncated closed form, full oracle): per-row values must
  agree within the truncation + 4-dp-rounding budget;
- `sample_seeded` (seeded-hash Bernoulli, full oracle since r9):
  row count inside 5-sigma binomial bounds, keys a duplicate-free
  subset of the source — the hash draw must be statistically
  indistinguishable from the RNG draw it replaces;
- `dedup_minhash_ml` (pyspark.ml MinHashLSH, engine-internal seeds)
  vs `dedup_minhash_lsh` (hand-rolled, full oracle): pair-set recall;
- `stat_freq_items` (KSP sketch, false positives allowed) vs
  `stat_freq_items_verified` (exact post-filter, full oracle): the
  sketch's guarantee is NO false negatives, so the verified items
  must be a subset of the sketch candidates.
"""

from __future__ import annotations

import duckdb

from ondemand_dask_spark.registry import all_queries

QUERIES = all_queries()


def test_udf_ewm_matches_bounded_twin(spark, sf_dir):
    exact = (
        QUERIES["udf_ewm"].fn(spark, sf_dir).toPandas().set_index("event_id")
    )
    bounded = (
        QUERIES["window_ewm_bounded"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("event_id")
    )
    joined = exact.join(
        bounded, lsuffix="_exact", rsuffix="_bounded", how="inner"
    )
    assert len(joined) == len(exact) == len(bounded)
    diff = (joined.ewm_value_exact - joined.ewm_value_bounded).abs()
    # budget: both sides round to 4 dp (worst-case 1e-4 combined) +
    # (1-alpha)^32 ~ 1.1e-5 relative truncation on O(100) values.
    # measured at sf0.001: max 0.0010, mean 0.0001.
    assert diff.max() <= 2e-3, f"max ewm divergence {diff.max()}"


def test_sample_seeded_binomial_bounds(spark, sf_dir):
    sampled = QUERIES["sample_seeded"].fn(spark, sf_dir).toPandas()
    assert list(sampled.columns) == ["o_orderkey", "o_totalprice"]
    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    p = 0.1
    mean, sigma = total * p, (total * p * (1 - p)) ** 0.5
    assert abs(len(sampled) - mean) <= 5 * sigma, (
        f"{len(sampled)} of {total} outside 5-sigma of Binomial(n, 0.1)"
    )
    # Bernoulli without replacement: every key at most once, and a
    # real subset of the source keys.
    assert not sampled.o_orderkey.duplicated().any()
    keys = set(
        duckdb.sql(
            f"SELECT o_orderkey FROM read_parquet('{sf_dir}/orders.parquet')"
        ).fetchdf()["o_orderkey"]
    )
    assert set(sampled.o_orderkey) <= keys


def test_dedup_minhash_ml_pairs_overlap_lsh(spark, sf_dir):
    ml = QUERIES["dedup_minhash_ml"].fn(spark, sf_dir).toPandas()
    lsh = QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir).toPandas()
    ml_pairs = set(zip(ml.doc_a, ml.doc_b))
    lsh_pairs = set(zip(lsh.doc_a, lsh.doc_b))
    assert lsh_pairs, "oracle-checked twin found no pairs — fixture drift"
    recall = len(ml_pairs & lsh_pairs) / len(lsh_pairs)
    # measured at sf0.001: 28/28 = 1.0; 0.8 leaves room for the ml
    # library's banding randomness at other SFs without letting a
    # broken pipeline (disjoint pair sets) pass.
    assert recall >= 0.8, (
        f"ml recall of hand-rolled LSH pairs {recall:.2f} "
        f"({len(ml_pairs)} ml vs {len(lsh_pairs)} lsh)"
    )


def test_stat_freq_items_superset_of_verified(spark, sf_dir):
    sketch = QUERIES["stat_freq_items"].fn(spark, sf_dir).toPandas().iloc[0]
    exact = (
        QUERIES["stat_freq_items_verified"]
        .fn(spark, sf_dir)
        .toPandas()
        .iloc[0]
    )

    def items(joined: str) -> set[str]:
        return set(joined.split(",")) if joined else set()

    for col in ["priority_freq_items", "status_freq_items"]:
        assert items(exact[col]) <= items(sketch[col]), (
            f"{col}: sketch dropped a guaranteed-frequent item "
            f"(exact={exact[col]!r} sketch={sketch[col]!r})"
        )
