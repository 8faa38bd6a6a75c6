"""Graph operators over edge DataFrames: PageRank by power iteration.
(Connected components lives in operators/dedup.py next to its dedup
call sites.)

Scale shape: each iteration is one shuffle (messages grouped by dst);
ranks and out-degrees stay partitioned by node across iterations, and
``localCheckpoint`` truncates lineage so plan analysis stays O(1) per
step instead of doubling.  Convergence for fixed ``iters`` is
deterministic — no data-dependent driver loop beyond the iteration
count, so the whole run is a fixed DAG of jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Weighted PageRank over an edge list, ``iters`` power iterations.

    Returns (node, rank) with ranks summing to ~1.  Dangling nodes
    (no out-edges) redistribute uniformly, folded in via one scalar
    aggregate per iteration.  Transition probability src->dst is
    weight / total-out-weight(src).
    """
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # transition matrix rows: (src, dst, p) — built once, reused each iter
    trans = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .select("dst", (F.col("p") * F.col("rank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_rank"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            ranks.join(out_w, ranks["node"] == out_w["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_rank"), F.lit(0.0)) + F.col("d") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """Synchronous label propagation (community detection), fully
    deterministic: every node starts labeled with itself; each
    iteration every node adopts the most frequent label among its
    (undirected) neighbors, ties broken by MIN label.

    Returns (node, lab).  Scale shape mirrors :func:`pagerank`: one
    message shuffle per iteration (edges join labels on the neighbor,
    count by (node, label), window-pick the winner), labels stay
    partitioned by node, ``localCheckpoint`` truncates lineage so the
    plan does not double per step.  Fixed ``iters`` keeps the whole
    run a static DAG — no convergence collect at all, and synchronous
    updates make the result independent of execution order (the
    classic async-LPA nondeterminism is defined away).
    """
    from pyspark.sql.window import Window

    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("lab"))
    for _ in range(iters):
        msgs = und.join(labels, und["b"] == labels["node"]).select(
            und["a"].alias("node"), "lab"
        )
        cnt = msgs.groupBy("node", "lab").agg(F.count("*").alias("cnt"))
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lab")
            .localCheckpoint(eager=False)
        )
    return labels


def ancestor_paths(
    edges: DataFrame,
    node: str = "node",
    parent: str = "parent",
    max_depth: int = 20,
) -> DataFrame:
    """Root-ward hierarchy traversal — Spark's answer to WITH RECURSIVE.

    ``edges`` is (node, parent) with parent NULL at roots.  Returns
    (node, depth, root, path) where ``path`` is the /-joined id chain
    from the root down to the node.  Executes as ``max_depth``
    iterative hash joins of the walking state against the edge table
    (a node already at its root passes through unchanged), with
    ``localCheckpoint`` lineage breaks every 4 hops so plan analysis
    stays linear.  Correct whenever the true depth never exceeds
    ``max_depth``; size it from the hierarchy's advertised depth (a
    balanced taxonomy is log2(n); only pathological chains approach n,
    and those want a pointer-doubling variant where ``cur`` jumps to
    its 2^i-th ancestor per round instead).
    """
    state = edges.select(
        F.col(node).alias("n0"),
        F.col(node).alias("cur"),
        F.lit(0).cast("long").alias("depth"),
        F.col(node).cast("string").alias("path"),
    )
    e = edges.select(
        F.col(node).alias("e_n"), F.col(parent).alias("e_p")
    ).localCheckpoint(eager=False)
    for i in range(max_depth):
        j = state.join(e, state["cur"] == e["e_n"], "left")
        at_root = F.col("e_p").isNull()
        state = j.select(
            "n0",
            F.when(at_root, F.col("cur")).otherwise(F.col("e_p"))
            .alias("cur"),
            F.when(at_root, F.col("depth")).otherwise(F.col("depth") + 1)
            .alias("depth"),
            F.when(at_root, F.col("path")).otherwise(
                F.concat(F.col("e_p").cast("string"), F.lit("/"),
                         F.col("path"))
            ).alias("path"),
        )
        if (i + 1) % 4 == 0:
            state = state.localCheckpoint(eager=False)
    return state.select(
        F.col("n0").alias(node), "depth", F.col("cur").alias("root"), "path"
    )


def ancestor_depths_doubling(
    edges: DataFrame,
    node: str = "node",
    parent: str = "parent",
    rounds: int = 5,
) -> DataFrame:
    """Depth/root via pointer doubling — the deep-hierarchy scale path
    :func:`ancestor_paths` points at.

    Maintains a jump table J_r mapping every node to its 2^r-th
    ancestor (roots self-loop with distance 0, so over-jumping is
    harmless) and SQUARES it each round (J_{r+1} = J_r o J_r) while the
    walking state composes through it: after ``rounds`` rounds every
    node has ascended 2^rounds - 1 levels — so ceil(log2(D+1)) rounds
    replace D sequential joins for a depth-D hierarchy (4 rounds
    instead of 13 at depth 13; 30 rounds cover a billion-deep chain).
    Two hash joins per round, lineage broken per round.
    """
    j = edges.select(
        F.col(node).alias("src"),
        F.coalesce(F.col(parent), F.col(node)).alias("dst"),
        F.col(parent).isNotNull().cast("long").alias("d"),
    ).localCheckpoint(eager=False)
    state = edges.select(
        F.col(node).alias("n0"),
        F.col(node).alias("cur"),
        F.lit(0).cast("long").alias("depth"),
    )
    for _ in range(rounds):
        state = state.join(j, state["cur"] == j["src"]).select(
            "n0",
            F.col("dst").alias("cur"),
            (F.col("depth") + F.col("d")).alias("depth"),
        ).localCheckpoint(eager=False)
        a, b = j.alias("a"), j.alias("b")
        j = a.join(b, F.col("a.dst") == F.col("b.src")).select(
            F.col("a.src").alias("src"),
            F.col("b.dst").alias("dst"),
            (F.col("a.d") + F.col("b.d")).alias("d"),
        ).localCheckpoint(eager=False)
    return state.select(
        F.col("n0").alias(node), "depth", F.col("cur").alias("root")
    )
