"""Partitioned staging layout must prune at the scan (SURVEY.md §4:
'partition staging by load date for pruning at 100 TB')."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from clv_data_pipeline_spark.simulate import simulate_daily_batch
from clv_data_pipeline_spark.sources.io import write_append


def test_load_date_partition_pruning(spark, tmp_path):
    staging = str(tmp_path / "staging")
    for day, seed in [("2026-01-01", 1), ("2026-01-02", 2), ("2026-01-03", 3)]:
        batch = simulate_daily_batch(
            spark, 100, f"{day} 00:00:00", seed=seed
        ).withColumn("load_date", F.lit(day).cast("date"))
        write_append(batch, staging, partition_by=["load_date"])

    tx = spark.read.parquet(staging)
    one_day = tx.filter(F.col("load_date") == "2026-01-02")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    # the filter must land in PartitionFilters (metadata pruning),
    # not in the data filters / post-scan filter
    assert "PartitionFilters" in plan
    assert "load_date" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]

    # and the pruned read returns exactly that day's rows
    full_counts = {
        str(r["load_date"]): r["n"]
        for r in tx.groupBy("load_date").agg(F.count("*").alias("n")).collect()
    }
    assert one_day.count() == full_counts["2026-01-02"]
