"""Scale-shape smoke for the round-6 session additions: item-item CF
at 2M interactions / 200k users / 25 items — the one new operator with
a self-join in the plan.  Same contract as test_scale_smoke.py: bound
wall time on the shared box to catch cost curves that would not
survive a scale-up (the co-occurrence join must stay vocab-bounded
per user, the similarity matrix must broadcast, and scoring must
shuffle once on the user key)."""

from __future__ import annotations

import pytest
import time

from pyspark.sql import functions as F
pytestmark = pytest.mark.slowsuite  # excluded from the default (driver) run; see pytest.ini


N_INTERACTIONS = 2_000_000
N_USERS = 200_000
N_ITEMS = 25


def test_item_cf_2m_interactions_vocab_bounded(spark):
    from clv_data_pipeline_spark.operators.recsys import item_cf_recommend

    ui = (
        spark.range(N_INTERACTIONS)
        .select(
            (F.col("id") % N_USERS).alias("u"),
            # md5-scatter so each user sees a pseudo-random item subset
            F.concat(
                F.lit("item_"),
                (
                    F.conv(
                        F.substring(F.md5(F.col("id").cast("string")), 1, 4),
                        16,
                        10,
                    ).cast("long")
                    % N_ITEMS
                ).cast("string"),
            ).alias("b"),
        )
        .distinct()
    )
    t0 = time.perf_counter()
    out = item_cf_recommend(ui)
    agg = out.agg(
        F.count("*").alias("n"),
        F.countDistinct("customer_id").alias("nu"),
    ).collect()[0]
    elapsed = time.perf_counter() - t0
    # every user with at least one unseen item gets exactly one rec
    assert agg["n"] == agg["nu"]
    assert agg["nu"] > N_USERS * 0.9
    assert elapsed < 120, f"item_cf took {elapsed:.1f}s on 2M interactions"


def test_dbscan_300k_points_grid_bounded(spark):
    """Grid-blocked DBSCAN at 300k points in 10 well-separated planted
    blobs: the pair join must stay cell-bounded (~n * avg-neighbors,
    never n^2), the cell contraction must keep CC off the point graph,
    and every blob must come out as exactly one cluster."""
    import time

    import numpy as np
    import pandas as pd

    from clv_data_pipeline_spark.operators.density import dbscan

    n, blobs = 300_000, 10

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            blob = (ids % np.uint64(blobs)).astype(np.float64)
            # fmix64-style hash noise in [-0.5, 0.5)^2 inside each blob
            def u(salt):
                x = ids * np.uint64(2654435761) + np.uint64(salt)
                x ^= x >> np.uint64(33)
                x *= np.uint64(0xFF51AFD7ED558CCD)
                x ^= x >> np.uint64(33)
                return (x % np.uint64(1_000_000)).astype(
                    np.float64
                ) / 1_000_000.0 - 0.5
            cx = (blob % 5) * 3.0
            cy = (blob // 5) * 3.0
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "x": np.round(cx + u(97), 6),
                    "y": np.round(cy + u(131), 6),
                }
            )

    pts = spark.range(n).mapInPandas(
        _gen, "id long, x double, y double"
    )
    t0 = time.perf_counter()
    out = dbscan(pts, eps=0.018, min_pts=5)
    from pyspark.sql import functions as F

    sizes = (
        out.filter(F.col("cluster_id") >= 0)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 10_000)
        .count()
    )
    n_noise = out.filter(F.col("cluster_id") == -1).count()
    elapsed = time.perf_counter() - t0
    assert sizes == blobs, f"expected {blobs} big clusters, got {sizes}"
    assert n_noise < n * 0.05
    assert elapsed < 150, f"dbscan took {elapsed:.1f}s on 300k points"
