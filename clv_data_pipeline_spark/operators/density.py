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


_DBSCAN_CHUNK = 4096  # probe rows per numpy block inside a cell group

#: candidate-pair budget for the pair-join plan: below it the
#: materialized neighbor join is faster end-to-end (fewer jobs, ~4 s
#: at sf0.1's 9.7M candidates); above it shuffled pair rows dominate
#: and the cell-kernel plan's flat O(9 x nodes) shuffle wins (sf0.3's
#: 87M candidates already took >30 s on the pair join).
_DBSCAN_PAIR_BUDGET = 30_000_000
#: point-count cap under which the pair-join plan's core/label frames
#: broadcast (ids + labels, ~16 B/row — 1M points ≈ 16 MB per build
#: side, inside executor broadcast budgets); above it those joins
#: stay shuffled and only the cell-bounded frames broadcast.
_DBSCAN_BCAST_POINTS = 1_000_000
#: occupied-coarse-cell cap for the driver-side pair estimate — the
#: same geometrically-bounded-frame premise as cc_bounded_driver;
#: past it, skip estimating and take the scale path directly.
_DBSCAN_MAX_CELLS = 500_000


def dbscan(pts: DataFrame, eps: float, min_pts: int) -> DataFrame:
    """Cluster ``pts(id, x, y)``; returns (id, cluster_id, is_core).

    ``cluster_id`` is the minimum member core id, -1 for noise.
    ``pts`` coordinates should be pre-rounded by the caller if the
    result must be engine/rerun-exact.

    Cost-based plan selector (round 9, after the scaling bench caught
    the pair-join plan going quadratic in shuffled rows: a fixed
    coordinate plane means density — and the eps-neighbor pair count —
    grows with the corpus, hitting ~10^9 candidate rows at 10x sf0.1):
    a driver-side estimate over the bounded occupied-cell histogram
    picks the materialized pair-join plan under _DBSCAN_PAIR_BUDGET
    candidates (fewer jobs — wins at small scale) and the cell-kernel
    plan above it (flat shuffle volume — wins at scale).  Both plans
    are exact and agree row-for-row (parity-pinned in
    tests/test_density.py)."""
    pts = pts.localCheckpoint()
    w = 2 * eps
    hist = (
        pts.groupBy(
            F.floor(F.col("x") / w).cast("long").alias("cx"),
            F.floor(F.col("y") / w).cast("long").alias("cy"),
        )
        .agg(F.count("*").alias("m"))
        .limit(_DBSCAN_MAX_CELLS + 1)
        .collect()
    )
    if len(hist) <= _DBSCAN_MAX_CELLS:
        cells = {(r["cx"], r["cy"]): r["m"] for r in hist}
        cand = sum(
            m
            * sum(
                cells.get((a + dx, b + dy), 0)
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            )
            for (a, b), m in cells.items()
        )
        if cand <= _DBSCAN_PAIR_BUDGET:
            # Round 13: the histogram the selector already collected
            # also bounds the POINT count, so the pair plan can know
            # its core/label frames are broadcastable (VERDICT r12
            # item 6's runtime-plan discipline applied here: the
            # AQE-final pair plan ran 14 SortMergeJoins, all against
            # point- or cell-bounded frames).  The forced cell-kernel
            # A/B at sf0.1 (9.7M candidates) measured 7.8 s vs the
            # pair plan's 5.5 s same-session, so the deferred
            # "per-cell kernel under the pair budget" third plan is
            # measured and REJECTED — the Python boundary dominates
            # below the budget.
            n_points = sum(m for m in (r["m"] for r in hist))
            return _dbscan_pair_join(
                pts, eps, min_pts,
                small_n=n_points <= _DBSCAN_BCAST_POINTS,
            )
    return _dbscan_cell_kernel(pts, eps, min_pts)


def _dbscan_cell_kernel(
    pts: DataFrame, eps: float, min_pts: int
) -> DataFrame:
    """The scale plan: exact multiplicity compression + per-cell numpy
    kernels (see :func:`dbscan` for selection).

    Scale shape (rebuilt in round 9 after the scaling bench caught the
    prior edge-list formulation going quadratic IN SHUFFLED ROWS: a
    fixed coordinate plane means density — and the eps-neighbor pair
    count — grows with the corpus; at 10x sf0.1 the materialized
    neighbor list hit ~10^9 rows in 2 AQE-coalesced partitions):

    1. EXACT multiplicity compression: points collapse to distinct
       (x, y) NODES with weight = point count and min_id.  Coincident
       points share every neighborhood, degree, core flag, and label,
       so all downstream math runs on nodes — the classic weighted-
       DBSCAN reduction (pre-rounded coordinates make collisions
       common at scale).
    2. Per-cell NUMPY KERNELS instead of a pair join: nodes hash-
       shuffle once per pass on the 2*eps coarse cell (9 build
       replicas each), and an applyInPandas kernel does the O(|probe|
       x |build|) distance work as chunked vectorized flops, emitting
       only aggregates — weighted degrees (pass A), distinct fine-
       cell adjacencies between core nodes (pass B), per-noncore-node
       min neighbor cluster label (pass C).  Candidate pairs never
       exist as rows, so the shuffle volume is O(9 x nodes) per pass
       regardless of density.
    3. Core-core connectivity still contracts to the eps/sqrt(2)
       fine-cell graph (bounded by the coordinate grid, not the
       corpus) and unions on the driver via cc_bounded_driver, with
       the distributed pointer-jump fallback past the edge cap.

    Exactness is unchanged: every distance test is the same
    d^2 <= eps^2 on the same doubles; only the execution shape moved
    from shuffled pair rows to in-kernel flops."""
    import pandas as pd

    eps2 = eps * eps
    w = 2 * eps
    fw = eps / math.sqrt(2)
    # collision-free bit-packed cell keys (cx<<32 | low32(cy)) — a
    # base-N composite collides for negative or large cy
    nodes = (
        pts.groupBy("x", "y")
        .agg(
            F.count("*").cast("long").alias("wt"),
            F.min("id").alias("min_id"),
        )
        .select(
            F.monotonically_increasing_id().alias("nid"),
            "x",
            "y",
            "wt",
            "min_id",
            F.floor(F.col("x") / w).cast("long").alias("cx"),
            F.floor(F.col("y") / w).cast("long").alias("cy"),
            (
                F.shiftleft(F.floor(F.col("x") / fw).cast("long"), 32)
                + F.floor(F.col("y") / fw)
                .cast("long")
                .bitwiseAND(F.lit(0xFFFFFFFF))
            ).alias("fcell"),
        )
        .localCheckpoint()
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def _grouped(df: DataFrame) -> DataFrame:
        """9 replicas per node; the (0,0) replica doubles as the probe
        row (probe set = rows whose own cell IS the group cell), so
        one exploded frame feeds each kernel — no probe/build union,
        half the shuffle lineage."""
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.col("cx") + dx).alias("gx"),
                            (F.col("cy") + dy).alias("gy"),
                        )
                        for dx, dy in offsets
                    ]
                )
            ).alias("g"),
        ).select(
            *df.columns, F.col("g.gx").alias("gx"),
            F.col("g.gy").alias("gy"),
        )

    def _split(pdf: pd.DataFrame):
        own = (pdf["cx"] == pdf["gx"]) & (pdf["cy"] == pdf["gy"])
        return pdf[own], pdf

    def _cell_kernel(df: DataFrame, fn, schema: str) -> DataFrame:
        """Run a per-cell kernel over hash-partitioned cell groups via
        mapInPandas: one Arrow conversion per PARTITION (~32), not per
        cell group (~hundreds) — applyInPandas' per-group conversion
        overhead was 20x the numpy flops at sf0.1.  Hash partitioning
        on (gx, gy) co-locates each cell's rows; the kernel groups
        them back with a pandas groupby."""

        def _runner(batches):
            pdfs = [p for p in batches if not p.empty]
            if not pdfs:
                return
            pdf = pd.concat(pdfs, ignore_index=True)
            outs = [
                fn(sub) for _, sub in pdf.groupby(["gx", "gy"], sort=False)
            ]
            outs = [o for o in outs if not o.empty]
            if outs:
                yield pd.concat(outs, ignore_index=True)

        return _grouped(df).repartition(
            F.col("gx"), F.col("gy")
        ).mapInPandas(_runner, schema)

    # ---- pass A: weighted degrees -> core flags -------------------
    def _degrees(pdf: pd.DataFrame) -> pd.DataFrame:
        p, b = _split(pdf)
        if p.empty:
            return pd.DataFrame({"nid": [], "nn": []}).astype(
                {"nid": "int64", "nn": "int64"}
            )
        bx = b["x"].to_numpy()
        by = b["y"].to_numpy()
        bw = b["wt"].to_numpy()
        out_n, out_nn = [], []
        for s in range(0, len(p), _DBSCAN_CHUNK):
            ch = p.iloc[s : s + _DBSCAN_CHUNK]
            dx = ch["x"].to_numpy()[:, None] - bx[None, :]
            dy = ch["y"].to_numpy()[:, None] - by[None, :]
            m = (dx * dx + dy * dy) <= eps2
            out_n.extend(ch["nid"].tolist())
            out_nn.extend((m @ bw).tolist())
        return pd.DataFrame({"nid": out_n, "nn": out_nn}).astype(
            {"nid": "int64", "nn": "int64"}
        )

    deg = _cell_kernel(
        nodes.select("nid", "x", "y", "wt", "cx", "cy"),
        _degrees,
        "nid long, nn long",
    )
    cnodes = (
        nodes.join(deg.filter(F.col("nn") >= min_pts), "nid")
        .localCheckpoint()
    )

    # ---- pass B: distinct fine-cell edges between core nodes ------
    def _cell_edges(pdf: pd.DataFrame) -> pd.DataFrame:
        p, b = _split(pdf)
        if p.empty or b.empty:
            return pd.DataFrame(
                {"cell_a": [], "cell_b": []}
            ).astype({"cell_a": "int64", "cell_b": "int64"})
        bx = b["x"].to_numpy()
        by = b["y"].to_numpy()
        bf = b["fcell"].to_numpy()
        pairs = set()
        for s in range(0, len(p), _DBSCAN_CHUNK):
            ch = p.iloc[s : s + _DBSCAN_CHUNK]
            dx = ch["x"].to_numpy()[:, None] - bx[None, :]
            dy = ch["y"].to_numpy()[:, None] - by[None, :]
            ii, jj = ((dx * dx + dy * dy) <= eps2).nonzero()
            pf = ch["fcell"].to_numpy()
            import numpy as np

            uq = np.unique(
                np.stack([pf[ii], bf[jj]], axis=1), axis=0
            )
            pairs.update(map(tuple, uq.tolist()))
        a, c = zip(*pairs) if pairs else ((), ())
        return pd.DataFrame({"cell_a": a, "cell_b": c}).astype(
            {"cell_a": "int64", "cell_b": "int64"}
        )

    core_cols = cnodes.select("nid", "x", "y", "fcell", "cx", "cy")
    cedges = _cell_kernel(
        core_cols, _cell_edges, "cell_a long, cell_b long"
    ).distinct()
    ccomp = cc_bounded_driver(cedges, "cell_a", "cell_b")
    cell_min = cnodes.groupBy("fcell").agg(
        F.min("min_id").alias("mid")
    )
    cell_lab = cell_min.join(
        ccomp, cell_min["fcell"] == ccomp["node"], "left"
    ).select(
        "fcell",
        "mid",
        F.coalesce(F.col("cluster_id"), F.col("fcell")).alias("cc"),
    )
    comp_lab = cell_lab.groupBy("cc").agg(
        F.min("mid").alias("cluster_id")
    )
    core_labeled_nodes = (
        cnodes.join(
            F.broadcast(cell_lab.select("fcell", "cc")), "fcell"
        )
        .join(F.broadcast(comp_lab), "cc")
        .select("nid", "x", "y", "cluster_id")
        .localCheckpoint()
    )

    # ---- pass C: border labels for non-core nodes -----------------
    def _border(pdf: pd.DataFrame) -> pd.DataFrame:
        p, b = _split(pdf)
        p = p[p["cluster_id"].isna()]
        b = b[b["cluster_id"].notna()]
        if p.empty or b.empty:
            return pd.DataFrame({"nid": [], "cl": []}).astype(
                {"nid": "int64", "cl": "int64"}
            )
        import numpy as np

        bx = b["x"].to_numpy()
        by = b["y"].to_numpy()
        bl = b["cluster_id"].to_numpy(dtype=np.int64)
        out_n, out_l = [], []
        big = np.iinfo(np.int64).max
        for s in range(0, len(p), _DBSCAN_CHUNK):
            ch = p.iloc[s : s + _DBSCAN_CHUNK]
            dx = ch["x"].to_numpy()[:, None] - bx[None, :]
            dy = ch["y"].to_numpy()[:, None] - by[None, :]
            m = (dx * dx + dy * dy) <= eps2
            lab = np.where(m, bl[None, :], big).min(axis=1)
            keep = lab != big
            out_n.extend(ch["nid"].to_numpy()[keep].tolist())
            out_l.extend(lab[keep].tolist())
        return pd.DataFrame({"nid": out_n, "cl": out_l}).astype(
            {"nid": "int64", "cl": "int64"}
        )

    all_with_lab = nodes.select("nid", "x", "y", "cx", "cy").join(
        core_labeled_nodes.select("nid", "cluster_id"), "nid", "left"
    )
    border_nodes = _cell_kernel(all_with_lab, _border, "nid long, cl long")

    # ---- expand node labels back to points ------------------------
    node_lab = (
        nodes.select("nid", "x", "y")
        .join(
            core_labeled_nodes.select(
                "nid", F.col("cluster_id").alias("core_cl")
            ),
            "nid",
            "left",
        )
        .join(border_nodes, "nid", "left")
        .select(
            "x",
            "y",
            F.coalesce(
                F.col("core_cl"), F.col("cl"), F.lit(-1).cast("long")
            ).alias("cluster_id"),
            F.col("core_cl").isNotNull().alias("is_core"),
        )
    )
    return pts.join(node_lab, ["x", "y"]).select(
        "id", "cluster_id", "is_core"
    )


def _dbscan_pair_join(
    pts: DataFrame, eps: float, min_pts: int, small_n: bool = False
) -> DataFrame:
    """The small-scale plan: materialized 3x3 cell pair join (see
    :func:`dbscan` for selection).  Quadratic in candidate pairs —
    only chosen under _DBSCAN_PAIR_BUDGET.

    ``small_n`` (round 13): the caller's occupied-cell histogram also
    counts the points, so when they fit _DBSCAN_BCAST_POINTS the
    point-bounded frames (core ids, component labels, border labels)
    carry explicit broadcast hints — the AQE-final plan otherwise ran
    them as SortMergeJoins against the 9.7M-row candidate frame
    (runtime stats arrive too late for joins planned off a
    localCheckpoint's aggregates).  Cell-bounded frames (the
    union-find labels — geometric bound, see cc_bounded_driver)
    broadcast unconditionally."""
    bc = F.broadcast if small_n else (lambda df: df)
    eps2 = eps * eps
    w = 2 * eps
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
    ce = nbr.join(bc(ca), "ia").join(bc(cb), "ib")
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
        ce.join(bc(cell_a), "ia")
        .join(bc(cell_b), "ib")
        .select("cell_a", "cell_b")
        .distinct()
    )
    # the fine-cell graph is bounded by the coordinate grid, not the
    # corpus (see cc_bounded_driver) — a driver union-find beats 6+
    # rounds of distributed pointer jumping on it; the operator falls
    # back to cc_pointer_jump past its edge cap.
    ccomp = cc_bounded_driver(cedges, "cell_a", "cell_b")
    cell_min = cmap.groupBy("cell").agg(F.min("id").alias("mid"))
    # ccomp is fine-cell-bounded (geometric, not corpus) — broadcast
    # unconditionally
    cell_lab = cell_min.join(
        F.broadcast(ccomp), cell_min["cell"] == ccomp["node"], "left"
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
        nbr.join(
            bc(core.select(F.col("id").alias("ia"))), "ia", "left_anti"
        )
        .join(
            bc(
                comp.select(
                    F.col("node").alias("ib"),
                    F.col("cluster_id").alias("cl"),
                )
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
        .join(bc(core_labeled.select("id")), "id", "left_anti")
        .join(bc(border_labeled.select("id")), "id", "left_anti")
        .select(
            "id",
            F.lit(-1).cast("long").alias("cluster_id"),
            F.lit(False).alias("is_core"),
        )
    )
    return core_labeled.unionAll(border_labeled).unionAll(noise)
