"""Structured Streaming ingest + windowed aggregates (SURVEY.md §2.8)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clv_data_pipeline_spark.operators.features import rfm_features
from clv_data_pipeline_spark.operators.sessions import session_stats
from clv_data_pipeline_spark.simulate import simulate_daily_batch
from clv_data_pipeline_spark.sources.io import load_table
from clv_data_pipeline_spark.streaming.ingest import (
    ingest_stream,
    streaming_sessions,
    windowed_event_counts,
)
from tests.conftest import SF_SMOKE


def test_available_now_ingest_full_refresh(spark, tmp_path):
    """Drop two daily batches into staging; the availableNow stream must
    drain exactly the new files per trigger and the foreachBatch full
    refresh must equal the batch-mode feature build."""
    src = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    feats_out = str(tmp_path / "features")

    b1 = simulate_daily_batch(spark, 50, "2026-01-01 00:00:00", seed=1)
    b1.write.mode("append").parquet(src)

    seen_counts = []

    def refresh(batch_df, batch_id):
        seen_counts.append(batch_df.count())
        # full refresh like the reference CTAS: recompute over ALL staged
        # data (the stream delivers increments; the refresh reads the table)
        full = spark.read.parquet(src)
        rfm_features(full, asof="2026-01-03").write.mode("overwrite").parquet(
            feats_out
        )

    q = ingest_stream(spark, src, ckpt, refresh)
    q.awaitTermination(120)
    assert sum(seen_counts) == b1.count()

    # second batch: only the new files flow through the stream
    b2 = simulate_daily_batch(spark, 50, "2026-01-02 00:00:00", seed=2)
    b2.write.mode("append").parquet(src)
    seen_counts.clear()
    q = ingest_stream(spark, src, ckpt, refresh)
    q.awaitTermination(120)
    assert sum(seen_counts) == b2.count()

    # refreshed features == batch-mode build over the full staging table
    got = spark.read.parquet(feats_out)
    want = rfm_features(spark.read.parquet(src), asof="2026-01-03")
    assert sorted(map(str, got.collect())) == sorted(map(str, want.collect()))


def test_windowed_counts_match_batch_groupby(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    win = windowed_event_counts(ev).orderBy("window_start")
    batch = (
        ev.groupBy(F.date_format(F.window("ts", "1 day").start, "yyyy-MM-dd HH:mm:ss").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    got = {r["window_start"]: r["n_events"] for r in win.collect()}
    want = {r["d"]: r["n"] for r in batch.collect()}
    assert got == want


def test_streaming_sessions_match_gap_and_island(spark):
    """session_window(30m) must produce the same (count, start) session
    set as the batch gap-and-island operator."""
    ev = load_table(spark, SF_SMOKE, "events")
    sw = streaming_sessions(ev, gap="30 minutes")
    gi = session_stats(ev, gap_seconds=1800)
    got = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in sw.collect()
    )
    want = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in gi.collect()
    )
    assert got == want


def test_streaming_query_runs_through_memory_sink(spark, tmp_path):
    """Drive the actual streaming engine (not batch reuse): file source
    -> windowed agg -> memory sink, availableNow."""
    src = str(tmp_path / "events_stream")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
    )
    agg = windowed_event_counts(stream.withColumn(
        "ts", F.col("ts")
    ))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from win_counts").collect()
    assert len(rows) == 30  # 30 days of events in January
    assert sum(r["n_events"] for r in rows) == 1000
