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
        # static across iterations: materialize once instead of
        # re-running the distinct per ranks update
        .localCheckpoint(eager=True)
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("wd"))
    # (src, dst, w, wd) — joined per iteration; checkpoint so the edge
    # scan + degree aggregation run once, not once per iteration
    ew = e.join(outw, "src").localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty graph")
    r0 = scale // n
    base = ((PPM - damping_ppm) * r0) // PPM
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("rank"))
    for it in range(iters):
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
        )
        # Checkpoint every THIRD iteration, not every iteration and not
        # never (r14, VERDICT r13 #2).  r13 dropped the per-iteration
        # cut entirely (the lazy localCheckpoint compiled .rdd per
        # iteration, which under AQE synchronously materializes every
        # shuffle stage at plan time — ~30 sequential micro-stage round
        # trips) and won warm medians, but the driver's cold run
        # REGRESSED 0.73x: the fully unrolled 5-iteration DAG pays its
        # whole analysis/codegen bill in one cold action.  The hybrid
        # bounds DAG depth at 3 iterations (2 joins + 1 agg each) while
        # keeping the driver round-trips at iters/3 instead of iters.
        # Cold fresh-process A/B at sf0.1: 6.85 s unrolled -> 5.46 s
        # (medians of 5; every-2 measured the same, so take the fewest
        # barriers).  Labels bit-identical — gate re-verified.
        if (it + 1) % 3 == 0 and (it + 1) < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 6,
) -> DataFrame:
    """Multi-source BFS: minimum hop count from any seed node, up to
    ``max_iters`` hops — reachability/radius analysis over entity or
    link graphs (and the level-synchronous kernel under label
    propagation and friends).

    Per round: join the *frontier* (nodes first reached last round)
    against the edge table (one key-equi shuffle), anti-join out nodes
    already levelled (visited-set semantics), localCheckpoint.  State is
    node-keyed (node, level BIGINT) rows; the frontier shrinks to empty
    on convergence and the loop exits early — driver learns only the
    frontier COUNT per round, never rows.

    Returns ``(node, level)`` for every node within max_iters hops of a
    seed (seeds at level 0).
    """
    # materialize the edge table once: the per-round frontier join
    # re-executes ``edges``'s whole lineage every iteration otherwise
    # (the pagerank ``ew`` / connected_components pattern; the q_bfs
    # gate feeds a distinct-aggregated lineitem derivation here)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    levels = seeds.select(
        F.col(seeds.columns[0]).alias("node"),
        F.lit(0).cast("long").alias("level"),
    ).distinct().localCheckpoint(eager=True)
    frontier = levels
    for i in range(1, max_iters + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(levels, "node", "left_anti")
            .select("node", F.lit(i).cast("long").alias("level"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        # levels is a union of ALREADY-checkpointed frontier frames —
        # re-checkpointing the union each round paid a copy job for data
        # that is all in cached partitions (r13); the union tree grows
        # one LogicalRDD leaf per round, bounded by max_iters
        levels = levels.unionByName(nxt)
        frontier = nxt
    return levels


def triangle_count(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count of an undirected graph — the cohesion
    metric for near-duplicate candidate graphs (how clique-like are the
    dup clusters) and a classic distributed-graph kernel.

    Edges are deduplicated undirected, then ORIENTED from the
    (degree, node)-smaller endpoint to the larger (the compact-forward /
    degree-orientation technique, Latapy 2008): every triangle has
    exactly one node with out-edges to both others, so counting wedges
    at that node and closing against the oriented edge set counts each
    triangle once.  The point at scale is the fan-out bound: a
    hub node of degree d contributes d² wedges under naive id ordering,
    but its OUT-degree under degree orientation is bounded by O(sqrt(m))
    (graph arboricity), so the wedge join cannot explode on skewed
    degree distributions — the shape real near-dup graphs have
    (boilerplate hubs).  Plan: one degree aggregation, two key-equi
    shuffle joins.

    Returns a single row ``(n_triangles BIGINT)``.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        # materialize: the canonical edge set is referenced 3x below
        # (deg twice via the a/b union, withdeg once), and each
        # reference re-executes the WHOLE upstream lineage — ruinous
        # when ``edges`` is itself an expensive subtree (the q_triangles
        # gate feeds the blocked Jaccard pair join here: 15 plan copies,
        # 60 parquet scans, 311 s at sf0.1 before the cut).  AQE stage
        # reuse cannot dedup them: column pruning gives each reference
        # a different canonical child plan.  Two longs per edge.
        .localCheckpoint(eager=True)
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient u -> v when (deg, id)(u) < (deg, id)(v); carry the rank
    # struct of the head so wedge pairs order without re-joining degrees
    withdeg = (
        canon.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("d", "da")
        .join(deg.withColumnRenamed("node", "b"), "b")
        .withColumnRenamed("d", "db")
    )
    ra = F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
    rb = F.struct(F.col("db").alias("d"), F.col("b").alias("n"))
    out = withdeg.select(
        F.when(ra < rb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ra < rb, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(ra < rb, rb).otherwise(ra).alias("rv"),
        # oriented edges are referenced 3x (both wedge-join sides + the
        # closure probe); cut here so the degree joins run once
    ).localCheckpoint(eager=True)
    e2 = out.select(
        F.col("u").alias("u2"),
        F.col("v").alias("w"),
        F.col("rv").alias("rw"),
    )
    wedges = (
        out.join(e2, out["u"] == e2["u2"])
        .filter(F.col("rv") < F.col("rw"))
        .select("v", "w")
    )
    closed = wedges.join(
        out.select(F.col("u").alias("v"), F.col("v").alias("w")),
        ["v", "w"],
    )
    return closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    max_iters: int = 8,
) -> DataFrame:
    """Multi-source weighted shortest paths, bounded Bellman-Ford: the
    minimum path weight from any seed using at most ``max_iters`` edges
    (integer weights; hop-bounded, so negative-cycle-safe by
    construction and exactly replayable by a hop-bounded recursive-CTE
    oracle).

    Per round: relax every edge out of the current distance table (one
    key-equi shuffle), union with the standing distances, groupBy-min on
    the node key (partial combine), localCheckpoint.  Early exit when a
    round improves nothing — the driver sees only the improved-count
    scalar.  State is (node, dist BIGINT) rows; generalizes bfs_levels
    (weight 1 ⇒ dist = hop level).
    """
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    # materialize once — every relax round re-executes the edge
    # lineage otherwise (same cut as pagerank's ``ew``)
    e = edges.select(
        F.col(src).alias("esrc"), F.col(dst).alias("edst"), w.alias("w")
    ).localCheckpoint(eager=True)
    dist = seeds.select(
        F.col(seeds.columns[0]).alias("node"),
        F.lit(0).cast("long").alias("dist"),
    ).distinct().localCheckpoint(eager=True)
    for _ in range(max_iters):
        relaxed = (
            dist.join(e, dist["node"] == e["esrc"])
            .select(
                F.col("edst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
                F.lit(None).cast("long").alias("old"),
            )
        )
        # tag pre-round rows with their own dist as ``old`` so the
        # improvement check is a scan of THIS checkpointed frame — the
        # old shape re-joined new distances against old (a keyed
        # shuffle + count job per round) only to ask "did anything
        # improve?" (r13, the connected_components fusion pattern)
        new = (
            dist.select("node", "dist", F.col("dist").alias("old"))
            .unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"), F.min("old").alias("old"))
            .localCheckpoint(eager=True)
        )
        improved = not new.filter(
            F.col("old").isNull() | (F.col("dist") < F.col("old"))
        ).isEmpty()
        dist = new.select("node", "dist")
        if not improved:
            break
    return dist
