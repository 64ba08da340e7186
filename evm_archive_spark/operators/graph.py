"""Distributed graph analytics over edge DataFrames — fixed-point
weighted PageRank (Page et al. 1999), the link-graph quality-signal lane
(web-corpus curation ranks hosts/pages by link authority before
sampling; the same kernel ranks event-transition graphs).

Spark-first shape: ranks live in a node-keyed DataFrame; each iteration
is one join edges⋈ranks (shuffle on the src key), one groupBy on dst
(partial aggregation), one left join back to the node table — all
key-equi shuffles on compact (node, BIGINT) rows, never an adjacency
collect.  Lineage is cut with localCheckpoint per iteration (the scd2 /
bpe_train lesson: Spark rejects deep self-referential plan trees).

All arithmetic is integer fixed-point (rank scaled by ``scale``,
damping in ppm, truncating integer division) so the result is exactly
reproducible by an independent engine — the parity gate hash-checks
ranks after 5 iterations against an unrolled DuckDB replay.  Dangling
mass (nodes with no out-edges) is dropped, the classic simplified
formulation; ranks then sum to < scale, which is fine for ordering and
is what the oracle computes too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PPM = 1_000_000


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 5,
    damping_ppm: int = 850_000,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Weighted PageRank with exact integer fixed-point arithmetic.

    r_0(v)   = scale DIV N
    r_t+1(v) = base + (damping_ppm * IN(v)) DIV 1e6
    IN(v)    = sum over edges (u, v, w) of (r_t(u) * w) DIV W(u)
    base     = ((1e6 - damping_ppm) * (scale DIV N)) DIV 1e6

    where W(u) is u's total out-weight and N the node count.  Returns
    ``(node, rank)`` with BIGINT ranks.  One scalar aggregate (N) runs
    on the driver up front; each iteration shuffles only node-keyed
    longs.
    """
    w = (
        F.col(weight).cast("long")
        if weight
        else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("wd"))
    ew = e.join(outw, "src")  # (src, dst, w, wd)
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty graph")
    r0 = scale // n
    base = ((PPM - damping_ppm) * r0) // PPM
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("rank"))
    for _ in range(iters):
        # DIV, not `/`: Spark `/` is double division and a double mantissa
        # rounds products past 2^53 (NOTES.md round-2 finding).
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(
                "dst",
                F.expr("CAST(rank * w DIV wd AS BIGINT)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.expr(
                    f"CAST({base} + {damping_ppm} * COALESCE(in_c, 0) "
                    f"DIV {PPM} AS BIGINT)"
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
