"""operators/density.py: pointer-jump CC and grid-blocked DBSCAN.

The long-chain case is the regression that motivated cc_pointer_jump:
linear min-label propagation needs diameter-many iterations, so a
path graph longer than the iteration cap fragments — pointer jumping
must converge in O(log diameter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clv_data_pipeline_spark.operators.density import (
    cc_pointer_jump,
    dbscan,
)


def test_cc_pointer_jump_long_chain(spark):
    """A 500-node path graph (diameter 499) must collapse to ONE
    component labeled by its minimum node — far beyond what 20 linear
    propagation rounds could reach."""
    edges = spark.range(499).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    out = cc_pointer_jump(edges, "a", "b")
    labels = [r["cluster_id"] for r in out.collect()]
    assert len(labels) == 500
    assert set(labels) == {0}


def test_connected_components_long_chain(spark):
    """The shared dedup-facade CC (q_dedup_clusters,
    q_entity_resolution, q_minhash_clusters, q_semantic_clusters) must
    also survive >25-hop chains — it now delegates to pointer jumping
    (VERDICT r6 ask 3: linear propagation's 25-round cap silently
    over-fragmented long boilerplate chains)."""
    from clv_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.range(199).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = connected_components(edges, "id_a", "id_b")
    labels = [r["cluster_id"] for r in out.collect()]
    assert len(labels) == 200
    assert set(labels) == {0}


def test_cc_pointer_jump_multiple_components(spark):
    """Disjoint chains keep distinct min labels."""
    e1 = spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    e2 = spark.range(10).select(
        (F.col("id") + 100).alias("a"), (F.col("id") + 101).alias("b")
    )
    out = cc_pointer_jump(e1.unionAll(e2), "a", "b")
    got = {
        r["node"]: r["cluster_id"] for r in out.collect()
    }
    assert all(got[n] == 0 for n in range(11))
    assert all(got[n] == 100 for n in range(100, 111))


def test_dbscan_negative_coord_cell_keys_do_not_collide(spark):
    """Two tight blobs ~100k apart in y, one at a negative fine-cell
    coordinate engineered so the old base-100000 composite key
    (cx*100000 + cy) collided: (1, -100000) == (0, 0).  A collision
    merges the blobs' fine cells into one CC supernode and labels them
    as ONE cluster; the bit-packed key must keep them separate."""
    import math

    eps = math.sqrt(2)  # fine width = eps/sqrt(2) = 1.0 exactly
    rows = [(i, 0.3 + 0.1 * i, 0.3 + 0.1 * i) for i in range(5)]
    rows += [
        (10 + i, 1.3 + 0.1 * i, -99999.7 + 0.1 * i) for i in range(5)
    ]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    out = dbscan(pts, eps=eps, min_pts=3).collect()
    labels = {r["id"]: r["cluster_id"] for r in out}
    assert labels[0] == 0 and labels[10] == 10, labels
    assert all(labels[i] == 0 for i in range(5))
    assert all(labels[10 + i] == 10 for i in range(5))


def test_dbscan_two_blobs_and_noise(spark):
    """Two tight 10-point blobs separated far beyond eps, plus one
    isolated point: two clusters labeled by their min ids, the
    isolated point is noise, all blob points are core."""
    rows = []
    for i in range(10):
        rows.append((i, 0.0 + 0.001 * i, 0.0))          # blob A
        rows.append((100 + i, 5.0 + 0.001 * i, 5.0))    # blob B
    rows.append((999, 50.0, 50.0))                      # noise
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    out = dbscan(pts, eps=0.05, min_pts=5).collect()
    got = {r["id"]: (r["cluster_id"], r["is_core"]) for r in out}
    assert all(got[i] == (0, True) for i in range(10))
    assert all(got[100 + i] == (100, True) for i in range(10))
    assert got[999] == (-1, False)


def test_dbscan_border_attaches_to_min_cluster(spark):
    """A point within eps of a dense blob but itself below min_pts
    density on its own side is a BORDER point: clustered, not core."""
    rows = [(i, 0.001 * i, 0.0) for i in range(8)]  # dense core run
    rows.append((50, 0.056, 0.0))  # within eps of the run edge only
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    out = dbscan(pts, eps=0.05, min_pts=8).collect()
    got = {r["id"]: (r["cluster_id"], r["is_core"]) for r in out}
    assert got[50][0] == 0 and got[50][1] is False


def test_dbscan_both_plans_agree_exactly(spark):
    """The cost-selected plans must be row-for-row identical: the
    pair-join plan (chosen under the candidate budget) and the
    cell-kernel plan (the scale path) implement the same exact
    d^2 <= eps^2 semantics — on the sf0.01 customer point set AND on
    a duplicate-heavy synthetic (coincident points exercise the
    kernel plan's multiplicity compression)."""
    from pyspark.sql import functions as F

    from clv_data_pipeline_spark.operators.density import (
        _dbscan_cell_kernel,
        _dbscan_pair_join,
    )
    from clv_data_pipeline_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    pts = orders.groupBy(F.col("o_custkey").alias("id")).agg(
        F.round(
            F.log1p(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast(
                    "double"
                )
            ),
            6,
        ).alias("x"),
        F.round(F.log1p(F.count("*")), 6).alias("y"),
    ).localCheckpoint()
    a = sorted(map(tuple, _dbscan_pair_join(pts, 0.03, 5).collect()))
    b = sorted(map(tuple, _dbscan_cell_kernel(pts, 0.03, 5).collect()))
    assert a == b and len(a) > 0

    rows = [(i, 0.001 * (i % 7), 0.0) for i in range(40)]  # dups
    rows += [(100 + i, 5.0 + 0.001 * i, 5.0) for i in range(6)]
    rows.append((999, 50.0, 50.0))
    dup_pts = spark.createDataFrame(
        rows, "id long, x double, y double"
    ).localCheckpoint()
    a = sorted(map(tuple, _dbscan_pair_join(dup_pts, 0.05, 5).collect()))
    b = sorted(
        map(tuple, _dbscan_cell_kernel(dup_pts, 0.05, 5).collect())
    )
    assert a == b


def test_item_cf_incremental_equals_full_recompute(spark):
    """The incremental-CF exactness invariant at operator level (the
    oracle proves it end-to-end): folding a delta into stored state
    must equal full recompute restricted to delta-touched users —
    including a user whose 'new' interaction repeats an existing pair
    (no count moves, but their ranking still re-scores)."""
    from clv_data_pipeline_spark.operators.recsys import (
        item_cf_incremental,
        item_cf_recommend,
    )

    base = spark.createDataFrame(
        [
            (1, "x"), (1, "y"),
            (2, "x"), (2, "z"),
            (3, "y"), (3, "z"),
            (4, "x"),
        ],
        "u long, b string",
    )
    # delta: user 4 adds z (new pair), user 2 re-buys x (no new pair),
    # user 5 is brand-new with one item
    delta = spark.createDataFrame(
        [(4, "z"), (2, "x"), (5, "y")], "u long, b string"
    )
    full_ui = base.unionAll(delta).distinct()
    expected = {
        (r["customer_id"], r["rec_brand"], r["score"])
        for r in item_cf_recommend(full_ui).collect()
        if r["customer_id"] in (2, 4, 5)
    }
    got = {
        (r["customer_id"], r["rec_brand"], r["score"])
        for r in item_cf_incremental(base, delta).collect()
    }
    assert got == expected
