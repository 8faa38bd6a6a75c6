"""Scale-shape smoke: the flagship aggregate and the as-of join on a
generated frame ~100x the oracle SF, wide key cardinality — catches
operators whose cost or memory curve would not survive a scale-up
(driver-side collects, per-key cross products, full sorts)."""

from __future__ import annotations

import pytest
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clv_data_pipeline_spark.operators.features import rfm_features
pytestmark = pytest.mark.slowsuite  # excluded from the default (driver) run; see pytest.ini


N_ROWS = 3_000_000
N_USERS = 200_000


def _big_events(spark):
    """3M deterministic synthetic transactions over 200k customers."""
    base_us = 1_700_000_000_000_000  # 2023-11-14 UTC
    month_us = 30 * 86_400_000_000
    return spark.range(N_ROWS).select(
        (F.col("id") % N_USERS).alias("CustomerID"),
        F.timestamp_micros(
            base_us + (F.col("id") * 37_000_003) % month_us
        ).alias("order_timestamp"),
        (F.pmod(F.col("id") * 2654435761, 990_000) / 10_000.0 + 1.0).alias(
            "TotalPurchase"
        ),
    )


def test_rfm_3m_rows_completes_and_aggregates(spark):
    ev = _big_events(spark)
    t0 = time.perf_counter()
    feats = rfm_features(ev, asof="2024-03-01")
    n = feats.count()
    elapsed = time.perf_counter() - t0
    assert n == N_USERS
    # partial+final hash agg over 3M rows on local[4] must stay well
    # under a minute; a driver-side or quadratic formulation would not
    assert elapsed < 60, f"flagship RFM took {elapsed:.1f}s on 3M rows"
    row = feats.filter(F.col("customer_id") == 0).first()
    assert row["frequency"] >= 0 and row["recency"] <= row["T"]


def test_asof_union_window_3m_rows_linear(spark):
    """The as-of join formulation must handle 3M left rows x 600k right
    rows without a pair explosion (the union keeps it at 3.6M rows)."""
    ev = _big_events(spark).select(
        F.col("CustomerID").alias("user_id"),
        F.unix_micros("order_timestamp").alias("ts_us"),
        F.col("TotalPurchase").alias("value"),
    )
    right = ev.filter(F.col("ts_us") % 5 == 0).select(
        "user_id", "ts_us", F.col("value").alias("pv"), F.lit(0).alias("side")
    )
    left = ev.select(
        "user_id", "ts_us", F.lit(None).cast("double").alias("pv"),
        F.lit(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t0 = time.perf_counter()
    n = (
        left.unionByName(right)
        .withColumn("last_pv", F.last("pv", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .count()
    )
    elapsed = time.perf_counter() - t0
    assert n == N_ROWS
    assert elapsed < 60, f"as-of took {elapsed:.1f}s on 3M rows"


def test_merge_upsert_3m_rows_linear(spark):
    """MERGE of a 200k-row delta into a 3M-row target: one shuffle
    join, no pair explosion, no driver-side state — and the delta wins
    on every overlapping key."""
    from clv_data_pipeline_spark.operators.merge import merge_upsert

    target = spark.range(N_ROWS).select(
        F.col("id").alias("k"), F.lit("old").alias("tag")
    )
    delta = spark.range(N_USERS).select(
        (F.col("id") * 7).alias("k"), F.lit("new").alias("tag")
    )
    t0 = time.perf_counter()
    out = merge_upsert(target, delta, ["k"])
    n = out.count()
    n_new = out.filter(F.col("tag") == "new").count()
    elapsed = time.perf_counter() - t0
    # keys 0,7,...,(200k-1)*7: those >= 3M insert; the rest update
    inserted = sum(1 for i in range(N_USERS) if i * 7 >= N_ROWS)
    assert n == N_ROWS + inserted
    assert n_new == N_USERS
    assert elapsed < 60, f"merge took {elapsed:.1f}s on 3M x 200k rows"


def _big_docs(spark, n_docs=200_000, dup_rate=10):
    """200k synthetic docs where every ``dup_rate``-th doc repeats an
    earlier text — deterministic, generated executor-side."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body token "),
            (F.col("id") % (n_docs // dup_rate)).cast("string"),
            F.lit(" trailing words for shingles abcdefghij"),
        ).alias("text"),
    )


def test_dedup_incremental_200k_delta_merge_linear(spark):
    """Incremental exact-dedup admission at 200k docs (10% delta): the
    merge is delta-sized work over a broadcast probe, so wall time must
    stay far under a minute on local[4]; a formulation that re-shuffles
    the index per delta would not."""
    from clv_data_pipeline_spark.operators.dedup import (
        dedup_incremental,
        fingerprint_index,
    )

    docs = _big_docs(spark)
    cut = 180_000
    base = docs.filter(F.col("doc_id") <= cut)
    delta = docs.filter(F.col("doc_id") > cut)
    t0 = time.perf_counter()
    admitted = dedup_incremental(fingerprint_index(base), delta)
    n = admitted.count()
    elapsed = time.perf_counter() - t0
    # every delta text already exists in the base (ids wrap at 20k),
    # so nothing is admitted — and the count proves the probe actually
    # consulted the 180k-entry index
    assert n == 0
    assert elapsed < 60, f"incremental dedup took {elapsed:.1f}s at 200k"
