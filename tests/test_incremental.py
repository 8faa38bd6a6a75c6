"""Incremental RFM maintenance: the fold-of-partials invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from clv_data_pipeline_spark.operators.features import rfm_features
from clv_data_pipeline_spark.operators.incremental import (
    daily_partials,
    merge_partials,
    rfm_from_partials,
)
from clv_data_pipeline_spark.simulate import simulate_daily_batch


def _canon(df):
    rounded = df.withColumn("monetary_value", F.round("monetary_value", 6))
    return sorted(map(str, rounded.collect()))


def test_incremental_equals_full_recompute(spark):
    """partials(day1) ++ partials(day2) folded == full recompute over
    the union — including a customer overlap between the days."""
    d1 = simulate_daily_batch(spark, 80, "2026-01-01 00:00:00", seed=1)
    d2 = simulate_daily_batch(spark, 80, "2026-01-02 00:00:00", seed=2)
    full = d1.unionByName(d2)

    incr = rfm_from_partials(
        merge_partials(
            daily_partials(d1).unionByName(daily_partials(d2))
        ),
        asof="2026-01-05",
    )
    batch = rfm_features(full, asof="2026-01-05", exact_monetary=True)
    assert _canon(incr) == _canon(batch)


def test_merge_partials_idempotent_on_reprocessed_day(spark):
    """Reprocessing the same day's partials twice then merging must not
    double-count (merge folds overlapping grains exactly)."""
    d1 = simulate_daily_batch(spark, 40, "2026-01-01 00:00:00", seed=3)
    p = daily_partials(d1)
    merged_once = merge_partials(p)
    # a second merge over already-merged partials changes nothing
    merged_twice = merge_partials(merged_once)
    assert _canon(
        rfm_from_partials(merged_once, asof="2026-01-03")
    ) == _canon(rfm_from_partials(merged_twice, asof="2026-01-03"))


def test_session_merge_equals_full_recompute_across_splits(spark):
    """merge_session_delta(base, delta) == session_stats(all) for every
    split point — including splits landing inside a session (island 0
    extends the tail), between sessions (new island), and the all-delta
    edge (no base rows for a user)."""
    from clv_data_pipeline_spark.operators.sessions import (
        merge_session_delta,
        session_stats,
    )
    from clv_data_pipeline_spark.sources.io import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    full = sorted(map(str, session_stats(ev, gap_seconds=1800).collect()))
    for split in (
        "2024-01-02 12:00:00",   # nearly all delta; many users base-less
        "2024-01-15 06:30:00",   # mid-month, mid-day: splits inside bursts
        "2024-01-31 00:00:00",   # nearly all base; sparse delta
    ):
        s = F.lit(split).cast("timestamp")
        base = session_stats(ev.filter(F.col("ts") < s), gap_seconds=1800)
        merged = merge_session_delta(
            base, ev.filter(F.col("ts") >= s), gap_seconds=1800
        )
        assert sorted(map(str, merged.collect())) == full, split
