"""Scale-shape smoke for the round-6 session additions: item-item CF
at 2M interactions / 200k users / 25 items — the one new operator with
a self-join in the plan.  Same contract as test_scale_smoke.py: bound
wall time on the shared box to catch cost curves that would not
survive a scale-up (the co-occurrence join must stay vocab-bounded
per user, the similarity matrix must broadcast, and scoring must
shuffle once on the user key)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

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
