"""Grid-blocked DBSCAN over 2-D point sets.

The textbook composition that keeps density clustering off the n^2
cliff (backs q_dbscan; oracle-verified there against the unblocked
quadratic definition + recursive reachability):

1. eps-neighborhoods from a 3x3 CELL equi-join at cell width 2*eps —
   a true neighbor pair can never straddle more than adjacent cells,
   and the exploded probe side is 9 rows per point, never a cross
   join;
2. per-point degrees (self-pair included) gate core points at
   min_pts;
3. CELL CONTRACTION before connected components: at fine width
   eps/sqrt(2), any two core points sharing a fine cell are within
   eps BY GEOMETRY, so contracting cells to supernodes preserves the
   component structure exactly while shrinking the CC input from
   ~n*density point-edges to the distinct-cell-pair graph;
4. border points attach to the minimum adjacent core cluster; the
   rest is noise (cluster_id = -1).

Cluster labels are the MIN core point id of each component —
deterministic across partitionings and identical to the recursive
MIN(reach) definition.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def cc_pointer_jump(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
    check_every: int = 2,
) -> DataFrame:
    """Min-label connected components with POINTER JUMPING — for
    long-diameter graphs where plain propagation
    (operators/dedup.connected_components) needs diameter-many
    shuffles: a DBSCAN fine-cell lattice has diameter ~1/eps, so the
    25-iteration propagation cap fragments components at scale.  Each
    round here does one propagation step (labels flow along edges)
    AND one pointer jump (label := label's label), halving the
    longest chain — convergence in O(log diameter) rounds instead of
    O(diameter).  Labels only decrease, so the scalar SUM(label)
    fixpoint test from the linear variant still applies; it runs
    every ``check_every`` rounds because each test is a driver action
    (a whole job) while an extra converged round is a no-op pass over
    an already-tiny label frame — at ~6 rounds typical, checking
    every 2 halves the job-boundary overhead for at most one wasted
    round.  Returns (node, cluster_id = min reachable node id)."""
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    sym = (
        e.union(
            e.select(
                F.col("nbr").alias("node"), F.col("node").alias("nbr")
            )
        )
        .filter(F.col("node") != F.col("nbr"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint(
        eager=False
    )
    prev_sum = None
    for it in range(max_iter):
        msgs = sym.join(
            labels.select(F.col("node").alias("nbr"), "label"), "nbr"
        ).select("node", "label")
        labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: adopt the label's own (never larger) label
        parent = labels.select(
            F.col("node").alias("label"), F.col("label").alias("plabel")
        )
        labels = (
            labels.join(parent, "label", "left")
            .select(
                "node",
                F.coalesce(F.col("plabel"), F.col("label")).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=False)
        )
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            cur_sum = labels.agg(F.sum("label")).collect()[0][0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    return labels.select("node", F.col("label").alias("cluster_id"))


def cc_bounded_driver(
    edges: DataFrame,
    src: str,
    dst: str,
    max_edges: int = 250_000,
) -> DataFrame:
    """Min-label connected components for GEOMETRICALLY BOUNDED graphs
    via a driver-side union-find — the bounded-barrier pattern the
    engine already uses for vocab^2 / bin frames: DBSCAN's fine-cell
    graph has at most (coordinate range / (eps/sqrt 2))^2 occupied
    cells whatever the row count, so its edge list is a bounded frame
    (~44k cells x 9 neighbors at q_dbscan's eps), and 6+ rounds of
    distributed pointer jumping spend seconds of job latency on data a
    driver dict unions in milliseconds.  Falls back to
    :func:`cc_pointer_jump` if the edge count exceeds ``max_edges`` —
    the guard that keeps an unbounded caller scale-safe.  The default
    cap is sized to the intended bounded-graph scale (~5x q_dbscan's
    cell graph): the probe collects up to max_edges+1 Row objects, so
    the cap bounds DRIVER MEMORY, not just the union-find's work —
    2M Rows would be hundreds of MB of Python object overhead, at
    odds with the milliseconds premise (ADVICE r8).  Identical
    result contract: (node, cluster_id = min reachable node id)."""
    e = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).distinct()
    rows = e.limit(max_edges + 1).collect()
    if len(rows) > max_edges:  # unbounded graph: stay distributed
        return cc_pointer_jump(edges, src, dst)
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the component min label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = {n for r in rows for n in r}
    spark = edges.sparkSession
    out = [(n, find(n)) for n in sorted(nodes)]
    return spark.createDataFrame(
        out, schema="node long, cluster_id long"
    )


def dbscan(pts: DataFrame, eps: float, min_pts: int) -> DataFrame:
    """Cluster ``pts(id, x, y)``; returns (id, cluster_id, is_core).

    ``cluster_id`` is the minimum member core id, -1 for noise.
    ``pts`` coordinates should be pre-rounded by the caller if the
    result must be engine/rerun-exact."""
    eps2 = eps * eps
    w = 2 * eps
    pts = pts.localCheckpoint()
    cells = pts.select(
        "id",
        "x",
        "y",
        F.floor(F.col("x") / w).cast("long").alias("cx"),
        F.floor(F.col("y") / w).cast("long").alias("cy"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probe = cells.select(
        F.col("id").alias("ia"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("cx"),
                        (F.col("cy") + dy).alias("cy"),
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("c"),
    ).select(
        "ia", "xa", "ya", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy")
    )
    build = cells.select(
        F.col("id").alias("ib"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    nbr = (
        probe.join(build, ["cx", "cy"])
        .filter(d2 <= F.lit(eps2).cast("double"))
        .select("ia", "ib")
    )
    nbr = nbr.localCheckpoint()
    deg = nbr.groupBy(F.col("ia").alias("id")).agg(
        F.count("*").cast("long").alias("nn")
    )
    core = deg.filter(F.col("nn") >= min_pts).select("id")
    ca = core.select(F.col("id").alias("ia"))
    cb = core.select(F.col("id").alias("ib"))
    ce = nbr.join(ca, "ia").join(cb, "ib")
    fw = eps / math.sqrt(2)
    # collision-free fine-cell key: bit-pack (cx, cy) as cx<<32 | low32
    # of cy — unique for any cx, cy in int32 range, including negative
    # coordinates (a base-N composite like cx*100000+cy collides when
    # cy is negative or |cy| >= N, silently merging distant cells)
    fcx = F.floor(F.col("x") / fw).cast("long")
    fcy = F.floor(F.col("y") / fw).cast("long")
    fcell = F.shiftleft(fcx, 32) + fcy.bitwiseAND(F.lit(0xFFFFFFFF))
    cmap = core.join(pts, "id").select("id", fcell.alias("cell"))
    cmap = cmap.localCheckpoint()
    cell_a = cmap.select(
        F.col("id").alias("ia"), F.col("cell").alias("cell_a")
    )
    cell_b = cmap.select(
        F.col("id").alias("ib"), F.col("cell").alias("cell_b")
    )
    cedges = (
        ce.join(cell_a, "ia")
        .join(cell_b, "ib")
        .select("cell_a", "cell_b")
        .distinct()
    )
    # the fine-cell graph is bounded by the coordinate grid, not the
    # corpus (see cc_bounded_driver) — a driver union-find beats 6+
    # rounds of distributed pointer jumping on it; the operator falls
    # back to cc_pointer_jump past its edge cap.
    ccomp = cc_bounded_driver(cedges, "cell_a", "cell_b")
    cell_min = cmap.groupBy("cell").agg(F.min("id").alias("mid"))
    cell_lab = cell_min.join(
        ccomp, cell_min["cell"] == ccomp["node"], "left"
    ).select(
        "cell",
        "mid",
        F.coalesce(F.col("cluster_id"), F.col("cell")).alias("cc"),
    )
    comp_lab = cell_lab.groupBy("cc").agg(
        F.min("mid").alias("cluster_id")
    )
    comp = (
        cmap.join(F.broadcast(cell_lab.select("cell", "cc")), "cell")
        .join(F.broadcast(comp_lab), "cc")
        .select(F.col("id").alias("node"), "cluster_id")
    )
    border = (
        nbr.join(core.select(F.col("id").alias("ia")), "ia", "left_anti")
        .join(
            comp.select(
                F.col("node").alias("ib"),
                F.col("cluster_id").alias("cl"),
            ),
            "ib",
        )
        .groupBy(F.col("ia").alias("id"))
        .agg(F.min("cl").alias("cluster_id"))
    )
    core_labeled = comp.select(
        F.col("node").alias("id"),
        "cluster_id",
        F.lit(True).alias("is_core"),
    )
    border_labeled = border.select(
        "id", "cluster_id", F.lit(False).alias("is_core")
    )
    noise = (
        pts.select("id")
        .join(core_labeled.select("id"), "id", "left_anti")
        .join(border_labeled.select("id"), "id", "left_anti")
        .select(
            "id",
            F.lit(-1).cast("long").alias("cluster_id"),
            F.lit(False).alias("is_core"),
        )
    )
    return core_labeled.unionAll(border_labeled).unionAll(noise)
