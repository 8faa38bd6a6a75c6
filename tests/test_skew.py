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
