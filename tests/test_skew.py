"""Skew-mitigation operators must be exact: salted formulations equal
their unsalted twins on the same input."""

from __future__ import annotations

from pyspark.sql import functions as F

from clv_data_pipeline_spark.operators.skew import salted_join
from clv_data_pipeline_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("tier", F.when(F.col("user_id") % 3 == 0, "gold").otherwise("std"))
    )
    got = salted_join(ev, dim, "user_id", salt_buckets=8)
    want = ev.join(dim, "user_id")
    assert sorted(map(str, got.collect())) == sorted(map(str, want.collect()))


def test_salted_join_left_outer_keeps_unmatched(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    dim = (
        ev.select("user_id").distinct().filter(F.col("user_id") % 2 == 0)
        .withColumn("flag", F.lit(1))
    )
    got = salted_join(ev, dim, "user_id", salt_buckets=4, how="left")
    want = ev.join(dim, "user_id", "left")
    assert sorted(map(str, got.collect())) == sorted(map(str, want.collect()))


def test_spread_partitions_widens_thin_source_and_is_exact(spark, tmp_path):
    """The shared parallelism guard (sources/io.spread_partitions,
    round 12 — generalized from the _pca_int_stats scan-skew fix): a
    single-file parquet source yields few scan partitions, the guard
    must widen it to defaultParallelism, be a no-op on an
    already-wide frame, and never change results (per-row kernels and
    integer sums are partitioning-independent)."""
    from pyspark.sql import functions as F

    from clv_data_pipeline_spark.sources.io import spread_partitions

    path = str(tmp_path / "thin.parquet")
    spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(path)
    thin = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    assert thin.rdd.getNumPartitions() < target
    wide = spread_partitions(thin)
    assert wide.rdd.getNumPartitions() == target
    # no-op at/above target — same object back, no extra exchange
    again = spread_partitions(wide)
    assert again is wide
    # results identical through a partition-sensitive-looking kernel
    got = sorted(
        wide.groupBy("v").agg(F.sum("id").alias("s")).collect(),
        key=lambda r: r["v"],
    )
    want = sorted(
        thin.groupBy("v").agg(F.sum("id").alias("s")).collect(),
        key=lambda r: r["v"],
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
