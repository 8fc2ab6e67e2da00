"""Iterative graph analytics over edge DataFrames.

The reference framework has no graph operators (its only iterative shape is
re-running a job; SURVEY.md §2.2); near-dup clustering already contributes
connected components (functions.dedup.near_dup_clusters). This module adds
the other canonical iterative-join algorithm, PageRank, in the
determinism discipline the repo's oracles require: per-iteration ranks are
exact integer nano-units, so the fixed-point arithmetic is order-free and
replays bitwise in an external engine (a float PageRank sums neighbor
contributions in partition order — different every run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 10**9


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Fixed-iteration PageRank on an undirected edge list, all-integer:

        r_0(v)    = NANO // N
        r_{k+1}(v) = ((100-d) * NANO) // (100 * N)
                     + (d * Σ_{u~v} (r_k(u) // deg(u))) // 100

    with d = ``damping_pct`` and every division an integer floor — the same
    milli/nano-quantization trick the LM and centroid operators use, applied
    per iteration so the quantization error cannot compound into
    engine-divergent doubles. Undirected graphs have no dangling nodes
    (every node has degree ≥ 1), so no sink redistribution term is needed.
    Returns (node, degree, rank_nano) for every node with at least one edge.

    Scale shape per iteration: one equi-join of the edge list against the
    rank table (both partitioned by node id) + one partial-agg shuffle of
    narrow (node, long) rows — the textbook distributed PageRank plan; a
    fixed iteration count keeps the lineage shallow (no checkpoint needed).
    The node count is the one bounded driver scalar (it sizes the teleport
    constant)."""
    # Materialize the (possibly expensive) edge derivation ONCE: every
    # iteration joins against `und`/`deg`, and `deg.count()` adds another
    # consumer — without truncation the upstream lineage (e.g. a Jaccard
    # inverted-index self-join) re-executes per iteration and the unrolled
    # plan grows multiplicatively (observed: OOM at sf0.1 from 3 iterations
    # x edge recompute). Same discipline as near_dup_clusters.
    und = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("degree")).localCheckpoint(
        eager=True
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        return deg.select(
            F.col("src").alias("node"),
            "degree",
            F.lit(0).cast("long").alias("rank_nano"),
        )
    base = ((100 - damping_pct) * NANO) // (100 * n_nodes)
    ranks = deg.select(
        "src", F.lit(NANO // n_nodes).cast("long").alias("rank_nano")
    )
    und_deg = und.join(deg, "src")
    for _ in range(iterations):
        contrib = und_deg.join(ranks, "src").select(
            F.col("dst").alias("src"),
            F.floor(F.col("rank_nano") / F.col("degree"))
            .cast("long")
            .alias("__c"),
        )
        incoming = contrib.groupBy("src").agg(F.sum("__c").alias("__in"))
        ranks = deg.join(incoming, "src", "left").select(
            "src",
            (
                F.lit(base)
                + F.floor(
                    F.lit(damping_pct) * F.coalesce(F.col("__in"), F.lit(0)) / 100
                ).cast("long")
            ).alias("rank_nano"),
        )
    return (
        deg.join(ranks, "src")
        .select(F.col("src").alias("node"), "degree", "rank_nano")
    )
