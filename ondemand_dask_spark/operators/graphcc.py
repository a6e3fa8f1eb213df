"""Connected components by large-star/small-star contraction.

The reusable operator behind `dedup_cc_star_contraction` (see that
query's docstring for the algorithm account; Kiveris et al.,
"Connected Components in MapReduce and Beyond").  Exposed separately
so arbitrary edge sets — not just the minhash pair graph — can use
it, and so property tests can drive it over adversarial topologies
(chains) where plain min-label propagation would need O(n) rounds.

Round structure: each large-star and small-star step is one
groupBy(min) plus one equi-join — two exchanges — and every round's
result is `localCheckpoint`ed so the plan stays constant-size, with
superseded round blocks released eagerly through
`release_local_checkpoint` (a plain `unpersist()` is a no-op on
checkpoint blocks — see operators/checkpoint.py).  Convergence is
detected from a two-scalar (count, hash-sum) edge-set checksum; the
driver never sees data rows; exhausting `max_rounds` without
reaching the fixpoint RAISES rather than returning a silently
non-star (wrong) labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ondemand_dask_spark.operators.checkpoint import release_local_checkpoint


def _checksum(e: DataFrame) -> tuple:
    row = e.agg(
        F.count("*").alias("c"),
        F.coalesce(
            F.sum(F.pmod(F.xxhash64("a", "b"), F.lit(1_000_000_007))),
            F.lit(0),
        ).alias("s"),
    ).first()
    return (row["c"], row["s"])


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # precondition: a > b for every edge (large-star output)
    m = e.groupBy("a").agg(F.min("b").alias("m"))
    j = e.join(m, "a")
    return (
        j.where(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .unionByName(m.select("a", F.col("m").alias("b")))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 32,
    stats: dict | None = None,
    contractions_per_checkpoint: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Labels for the graph `edges[(src, dst)]` by star contraction.

    Returns (labels, star_edges): labels is (node, cluster_id) over
    every node incident to a non-loop edge, cluster_id = component
    minimum; star_edges is the converged (a → component-min) edge set
    whose checkpoint blocks labels' plan reads — the CALLER owns its
    lifetime (release via release_local_checkpoint after the labels
    materialize; plain unpersist() is a no-op on checkpoint blocks).  At the
    fixpoint every non-min node appears exactly once on the `a` side
    and every component min on the `b` side, so labels read straight
    off the stars with no join.  Self-loops are dropped; a node with
    ONLY self-loop edges does not appear (matches the pair-graph
    semantics where pairs are strict a < b)."""
    e0 = edges.select(
        F.greatest(F.col(src), F.col(dst)).alias("a"),
        F.least(F.col(src), F.col(dst)).alias("b"),
    ).where(F.col(src) != F.col(dst))
    cur_edges = e0.distinct().localCheckpoint()
    prev = _checksum(cur_edges)
    rounds = 0
    converged = False
    while rounds < max_rounds:
        # `contractions_per_checkpoint` rounds per checkpoint+
        # checksum: each round is cheap declarative work (2 aggs +
        # 2 joins) but every checkpoint materialization and checksum
        # is a full job; batching trades wasted no-op rounds past the
        # fixpoint (a contraction of a converged star set is a no-op,
        # so correctness is unaffected) against job count.  The
        # batched lineage stays constant-size between checkpoints.
        # r8 interleaved A/B on dedup_connected_components at sf0.1
        # (one warm session, 4 rounds): cpc=1 2.36 s, cpc=2 2.36 s,
        # cpc=3 2.57 s best-of-4 — a wash; the pair-graph build, not
        # per-round job overhead, dominates at this shape, so the
        # default stays 1 (finest convergence granularity).  The knob
        # remains for deep-chain topologies where checkpoint count
        # scales with diameter (see tools/probe_star_cc.py).
        # never run past the max_rounds CONTRACTION budget: the knob
        # batches checkpoints, it must not multiply the bound
        batch = min(contractions_per_checkpoint, max_rounds - rounds)
        new_edges = cur_edges
        for _ in range(batch):
            new_edges = _small_star(_large_star(new_edges))
        new_edges = new_edges.localCheckpoint()
        cur = _checksum(new_edges)
        release_local_checkpoint(cur_edges)
        cur_edges = new_edges
        # rounds counts EXECUTED contractions; with batch > 1 up to
        # batch-1 of the last batch may be past-fixpoint no-ops (we
        # only checksum at batch ends — the documented trade)
        rounds += batch
        if cur == prev:
            converged = True
            break
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"star contraction did not converge within {max_rounds} "
            "contractions (rounds needed grow ~log2(n); raise "
            "max_rounds)"
        )
    labels = cur_edges.select(
        F.col("a").alias("node"), F.col("b").alias("cluster_id")
    ).unionByName(
        cur_edges.select(
            F.col("b").alias("node"), F.col("b").alias("cluster_id")
        ).distinct()
    )
    return labels, cur_edges
